"""E12: Contact extractor (contact-extractor.service.js:20-231).

Phones (3 regex families, 7-15 digit gate + tel: hrefs), emails
(+false-positive blacklist + mailto: hrefs), hours (5 regex families +
itemprop=openingHours), fax (Fax:-prefixed lines), website (non-social
absolute link origins), social links, contact person.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from ..functions.domlite import Doc

_PHONE_RES = (
    re.compile(r"(\+?1[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}"),
    re.compile(r"\+\d{1,3}[-.\s]?\d{1,4}[-.\s]?\d{1,4}[-.\s]?\d{1,4}[-.\s]?\d{1,4}"),
    re.compile(r"\b0{1,2}\d{1,4}[-.\s]?\d{1,4}[-.\s]?\d{3,4}[-.\s]?\d{3,4}\b"),
)
_EMAIL_RE = re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b")
_EMAIL_BLACKLIST = ("example.com", "domain.com", ".png", ".jpg")

_HOURS_RES = (
    re.compile(r"(Monday|Mon|Tuesday|Tue|Wednesday|Wed|Thursday|Thu|Friday|Fri|Saturday|Sat|Sunday|Sun)[\s-]+(to|through|thru|-)[\s]+(Monday|Mon|Tuesday|Tue|Wednesday|Wed|Thursday|Thu|Friday|Fri|Saturday|Sat|Sunday|Sun)[\s:]+\d{1,2}:\d{2}\s*[AP]M[\s-]+\d{1,2}:\d{2}\s*[AP]M", re.I),
    re.compile(r"(Mon|Tue|Wed|Thu|Fri|Sat|Sun)[-]+(Mon|Tue|Wed|Thu|Fri|Sat|Sun)\s+\d{1,2}[ap]m[-–]\d{1,2}[ap]m", re.I),
    re.compile(r"\d{1,2}:\d{2}\s*[AP]M[\s-]+\d{1,2}:\d{2}\s*[AP]M", re.I),
    re.compile(r"Open\s+(Monday|Mon|Tuesday|Tue|Wednesday|Wed|Thursday|Thu|Friday|Fri|Saturday|Sat|Sunday|Sun)[\s-]+(Monday|Mon|Tuesday|Tue|Wednesday|Wed|Thursday|Thu|Friday|Fri|Saturday|Sat|Sunday|Sun)", re.I),
    re.compile(r"Hours?[\s:]+\d{1,2}[ap]m[\s-]+\d{1,2}[ap]m", re.I),
)

_FAX_RE = re.compile(r"fax[\s:]+([+\d\s\-().]{7,20})", re.I)
_SOCIAL = ("facebook.com", "twitter.com", "x.com", "instagram.com",
           "linkedin.com", "youtube.com", "tiktok.com")
_PERSON_RE = re.compile(r"(?:Contact|Manager)\s*:\s*([A-Z][a-z]+\s+[A-Z][a-z]+)")


def extract_phones(doc: Doc) -> list[str]:
    text = doc.body_text()
    phones: dict[str, None] = {}
    for rx in _PHONE_RES:
        for m in rx.finditer(text):
            cleaned = m.group(0).strip()
            digits = sum(c.isdigit() for c in cleaned)
            if 7 <= digits <= 15:
                phones.setdefault(cleaned)
    for a in doc.by_tag("a"):
        href = a.attr("href") or ""
        if href.startswith("tel:"):
            tel = href[4:].strip()
            if tel:
                phones.setdefault(tel)
    return list(phones)


def extract_emails(doc: Doc) -> list[str]:
    emails: dict[str, None] = {}
    for m in _EMAIL_RE.finditer(doc.body_text()):
        e = m.group(0)
        if not any(b in e for b in _EMAIL_BLACKLIST):
            emails.setdefault(e.lower())
    for a in doc.by_tag("a"):
        href = a.attr("href") or ""
        if href.startswith("mailto:"):
            e = href[7:].split("?")[0].strip()
            if "@" in e:
                emails.setdefault(e.lower())
    return list(emails)


def extract_hours(doc: Doc) -> list[str]:
    text = doc.body_text()
    hours = []
    for rx in _HOURS_RES:
        hours.extend(m.group(0).strip() for m in rx.finditer(text))
    for n in doc.root.find_all(lambda e: e.attr("itemprop") == "openingHours"):
        v = n.attr("content") or n.text().strip()
        if v:
            hours.append(v)
    return hours


def extract_fax(doc: Doc) -> list[str]:
    return [m.group(1).strip() for m in _FAX_RE.finditer(doc.body_text())]


def extract_websites(doc: Doc) -> list[str]:
    out: dict[str, None] = {}
    for a in doc.by_tag("a"):
        href = a.attr("href") or ""
        if href.startswith("http"):
            low = href.lower()
            if not any(s in low for s in _SOCIAL):
                try:
                    p = urlsplit(href)
                    out.setdefault(f"{p.scheme}://{p.netloc}")
                except ValueError:
                    pass
    return list(out)


def extract_social(doc: Doc) -> list[str]:
    out: dict[str, None] = {}
    for a in doc.by_tag("a"):
        href = (a.attr("href") or "").lower()
        if any(s in href for s in _SOCIAL):
            out.setdefault(a.attr("href"))
    return list(out)


def extract_contact_person(doc: Doc) -> str:
    m = _PERSON_RE.search(doc.body_text())
    return m.group(1) if m else ""


def extract_contact_info(doc: Doc) -> dict:
    return {"phone": extract_phones(doc), "email": extract_emails(doc),
            "hours": extract_hours(doc), "fax": extract_fax(doc),
            "website": extract_websites(doc), "social": extract_social(doc),
            "contact_person": extract_contact_person(doc)}
