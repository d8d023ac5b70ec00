"""Deterministic synthetic corpus generator (FIXTURES.md §§1,3,4).

Produces the ``docs(doc_id, spans)`` table in exactly the BASELINE.json
``input_hint`` shape.  Content is seeded (seed=42), derived only from the
reference's own embedded examples (MRZ fixture backend/mrz_parser.py:494-497,
labor-card labels backend/config_new.py:83-115, pattern tables) — no
external data.

Corpus mix per FIXTURES.md: 13 document types by weight, 2% UNKNOWN noise
that must fail the classification gate, ~3% failing quality metrics, ~1%
media-heavy skew probes (512-4096 media spans; always PASSPORT so the filler
spans are provably inert for extraction).
"""

from __future__ import annotations

import html as _htmllib
import random
from typing import Dict, List, Tuple

from ..extractors.media import encode_media_ref

SEED = 42

TYPE_WEIGHTS: List[Tuple[str, float]] = [
    ("PASSPORT", 0.15), ("LABOR_CARD", 0.10), ("RESIDENCE_VISA", 0.10),
    ("EMIRATES_ID", 0.10), ("VISIT_VISA", 0.08), ("HOME_COUNTRY_ID", 0.08),
    ("INVOICE", 0.10), ("PURCHASE_ORDER", 0.07), ("COMPANY_LICENSE", 0.07),
    ("LABOR_CONTRACT", 0.05), ("COMPANY_VAT_CERTIFICATE", 0.04),
    ("VISA_CANCELLATION", 0.03), ("ENTRY_PERMIT", 0.03),
]

GIVEN = ["RAHUL", "AMIT", "SURESH", "CHURCHIL", "FAISAL", "JOSEPH", "DAVID",
         "IMRAN", "ARJUN", "KIRAN", "SAMEER", "VIKRAM"]
MIDDLE = ["KUMAR", "SUNDAR", "ANAND", "PRASAD", "MOHAN", "RAJAN", "SINGH"]
SUR = ["SHARMA", "MEKALA", "PATEL", "NAIR", "KHAN", "VERMA", "PILLAI",
       "GEORGE", "IYER", "REDDY"]
COMPANIES = ["ENGISOFT TECHNICAL SERVICES", "GULF STAR TRADING",
             "ALPHA CONSTRUCTION", "BLUEWAVE LOGISTICS", "DESERT ROSE CATERING",
             "IRONCLAD ENGINEERING", "SILVERLINE CONTRACTING"]
INDIAN_CITIES = ["Mumbai", "Delhi", "Chennai", "Madurai", "Kochi",
                 "Hyderabad", "Pune", "Coimbatore"]
UAE_CITIES = ["DUBAI", "SHARJAH", "AJMAN", "FUJAIRAH"]
MRZ_CC = ["IND", "PAK", "BGD", "PHL", "EGY", "NPL", "LKA"]
FILLER_WORDS = ["archival", "microfiche", "fragment", "segment", "overlay",
                "band", "sector", "sleeve", "ledger", "spool"]
NOISE_WORDS = ["lorem", "vapor", "quartz", "meadow", "plume", "cinder",
               "harbor", "willow", "ember", "drift", "basalt", "fjord"]

QC_GOOD = {"w": 1240, "h": 920, "blur": 260.0, "brightness": 138.0,
           "contrast": 62.0, "skew": 1.2}
QC_FAILS = [
    {"w": 1240, "h": 920, "blur": 12.0, "brightness": 138.0, "contrast": 62.0, "skew": 0.5},
    {"w": 1240, "h": 920, "blur": 260.0, "brightness": 21.0, "contrast": 62.0, "skew": 0.5},
    {"w": 1240, "h": 920, "blur": 260.0, "brightness": 138.0, "contrast": 11.0, "skew": 0.5},
    {"w": 340, "h": 260, "blur": 260.0, "brightness": 138.0, "contrast": 62.0, "skew": 0.5},
]
# pass the gate but trip the Q5 warn channel (reference
# image_quality_checker.py:93,127-129,142): rotated >5deg; borderline
# sharpness (blur in [50,75)); borderline + score 67.1 in [50,70)
QC_WARNS = [
    {"w": 1240, "h": 920, "blur": 260.0, "brightness": 138.0, "contrast": 62.0, "skew": 7.3},
    {"w": 1240, "h": 920, "blur": 60.0, "brightness": 138.0, "contrast": 62.0, "skew": 0.8},
    {"w": 1240, "h": 920, "blur": 60.0, "brightness": 190.0, "contrast": 62.0, "skew": 0.8},
]


def _name3(rng: random.Random) -> Tuple[str, str, str]:
    return rng.choice(GIVEN), rng.choice(MIDDLE), rng.choice(SUR)


def _date(rng: random.Random, y0: int, y1: int) -> Tuple[int, int, int]:
    return rng.randint(y0, y1), rng.randint(1, 12), rng.randint(1, 28)


# ---------------------------------------------------------------------------
# per-type text templates (lines)
# ---------------------------------------------------------------------------

def _passport_lines(rng: random.Random) -> List[str]:
    g, md, s = _name3(rng)
    cc = rng.choice(MRZ_CC)
    ppt = f"{rng.choice('KLMWZ')}{rng.randint(1000000, 9999999)}"
    by, bm, bd = _date(rng, 1958, 2004)
    ey, em, ed = _date(rng, 2026, 2034)
    dob = f"{by % 100:02d}{bm:02d}{bd:02d}"
    exp = f"{ey % 100:02d}{em:02d}{ed:02d}"
    sex = rng.choice("MF")
    file_no = "".join(str(rng.randint(0, 9)) for _ in range(13))
    city = rng.choice(INDIAN_CITIES)

    l1 = f"P<{cc}{s}<{md}<<{g}"
    l1 = l1 + "<" * max(0, 44 - len(l1))
    l2 = f"{ppt}<{rng.randint(0,9)}{cc}{dob}{rng.randint(0,9)}{sex}{exp}{rng.randint(0,9)}{file_no}<{rng.randint(0,9)}"
    iy, im, idd = _date(rng, 2016, 2023)
    return [
        "REPUBLIC OF PASSPORT AUTHORITY",
        "PASSPORT",
        f"Passport No. {ppt}",
        "Nationality shown below",
        f"Date of Birth {bd:02d}/{bm:02d}/{by}",
        f"Sex {sex}",
        f"Date of Issue {idd:02d}/{im:02d}/{iy}",
        f"Place of Issue {city}",
        l1,
        l2,
    ]


def _labor_card_lines(rng: random.Random) -> List[str]:
    g, md, s = _name3(rng)
    wp = str(rng.randint(100000000, 999999999))            # 9 digits
    pn = str(rng.randint(10 ** 13, 10 ** 14 - 1))          # 14 digits
    ey, em, ed = _date(rng, 2025, 2030)
    prof = rng.choice(["Civil Engineer", "Project Manager", "Site Supervisor",
                       "Heavy Driver", "Sales Manager"])
    return [
        "Ministry of Human Resources and Emiratisation",
        "Work Permit",
        f"Name : {g} {md} {s}",
        f"Work Permit NO : {wp}",
        f"Personal NO : {pn}",
        f"Card NO : {rng.randint(1000000, 9999999)}",
        f"Occupation shown as Profession : {prof}",
        "Nationality : INDIAN",
        f"Establishment : {rng.choice(COMPANIES)} LLC",
        f"Expiry Date : {ed:02d}/{em:02d}/{ey}",
    ]


def _residence_visa_lines(rng: random.Random) -> List[str]:
    g, md, s = _name3(rng)
    uid = str(rng.randint(100000000, 999999999))
    iy, im, idd = _date(rng, 2021, 2023)
    ey = iy + 2
    return [
        "UNITED ARAB EMIRATES RESIDENCE",
        f"U.I.D.No : {uid}",
        f"File No : {rng.randint(100, 999)}/{iy}/{rng.randint(100000, 9999999)}",
        f"{g} {md} {s}",
        f"Passport number {rng.choice('KLM')}{rng.randint(1000000, 9999999)}",
        "Profession : SALES MANAGER",
        f"Sponsor : {rng.choice(COMPANIES)} LLC",
        f"Place of Issue : {rng.choice(UAE_CITIES)}",
        f"Issue Date {iy}/{im:02d}/{idd:02d}",
        f"Valid Until {ey}/{im:02d}/{idd:02d}",
    ]


def _emirates_id_lines(rng: random.Random) -> List[str]:
    g, md, s = _name3(rng)
    by, bm, bd = _date(rng, 1960, 2000)
    iy, im, idd = _date(rng, 2020, 2023)
    ey = iy + 2
    return [
        "UNITED ARAB EMIRATES IDENTITY CARD",
        f"ID Number : 784-{by}-{rng.randint(1000000, 9999999)}-{rng.randint(0, 9)}",
        f"Card Number : {rng.randint(10000000, 99999999)}",
        f"{g.title()} {md.title()} {s.title()}",
        "Nationality : INDIA",
        f"Date of Birth {bd:02d}/{bm:02d}/{by}",
        f"Issuing Date {idd:02d}/{im:02d}/{iy}",
        f"Expiry Date {idd:02d}/{im:02d}/{ey}",
        f"Sex: {rng.choice('MF')}",
    ]


def _visit_visa_lines(rng: random.Random) -> List[str]:
    g, md, s = _name3(rng)
    by, bm, bd = _date(rng, 1962, 2002)
    iy, im, idd = _date(rng, 2023, 2025)
    return [
        f"VISIT VISA {rng.choice([30, 60, 90])} DAYS",
        "Visa Type : VISIT SINGLE ENTRY",
        "Entry Type : Visit",
        "Visa Status : Approved",
        "ENTRY PERMIT NO",
        f"{rng.randint(10 ** 12, 10 ** 13 - 1)}",
        "U.I.D NO",
        f"{rng.randint(10 ** 13, 10 ** 14 - 1)}",
        f"Issued On : {idd:02d}/{im:02d}/{iy} Dubai",
        f"Name: {g} {md}",
        "Nationality: INDIAN",
        "Place of Birth: CHENNAI",
        f"DOB: {bd:02d}/{bm:02d}/{by}",
        f"Passport No: {rng.choice('KL')}{rng.randint(1000000, 9999999)}",
        "Profession: ENGINEER",
    ]


def _home_country_id_lines(rng: random.Random) -> List[str]:
    g, md, s = _name3(rng)
    by, bm, bd = _date(rng, 1960, 2003)
    aad = f"{rng.randint(2, 9)}{rng.randint(100, 999)} {rng.randint(1000, 9999)} {rng.randint(1000, 9999)}"
    return [
        "GOVERNMENT OF INDIA",
        "AADHAAR",
        "Unique Identification Authority of India",
        f"{g.title()} {md.title()} {s.title()}",
        f"DOB: {bd:02d}/{bm:02d}/{by}",
        rng.choice(["MALE", "FEMALE"]),
        f"S/O {rng.choice(GIVEN).title()} {rng.choice(SUR).title()}",
        f"House {rng.randint(1, 99)}, MG Road",
        f"{rng.choice(INDIAN_CITIES)} {rng.randint(500000, 699999)}",
        aad,
    ]


def _invoice_lines(rng: random.Random) -> List[str]:
    sup = rng.choice(COMPANIES)
    cust = rng.choice([c for c in COMPANIES if c != sup])
    n_items = rng.randint(1, 4)
    subtotal = rng.randint(1000, 9000)
    tax = round(subtotal * 0.05, 2)
    iy, im, idd = _date(rng, 2023, 2025)
    lines = [
        f"{sup} LLC",
        "TAX INVOICE",
        f"Inv No: INV-{rng.randint(1000, 99999)}",
        f"Invoice Date: {idd:02d}/{im:02d}/{iy}",
        f"Due Date: {idd:02d}/{(im % 12) + 1:02d}/{iy}",
        f"{rng.randint(10, 99)} Industrial Street, Dubai",
        f"Phone: +971 4 {rng.randint(100, 999)} {rng.randint(1000, 9999)}",
        f"Email: billing@{sup.split()[0].lower()}.ae",
        f"GST: {rng.randint(10 ** 9, 10 ** 10 - 1)}AB",
        "billed to :",
        f"{cust} LLC",
        f"{rng.randint(10, 99)} Marina Plaza, Abu Dhabi",
        f"Phone: +971 2 {rng.randint(100, 999)} {rng.randint(1000, 9999)}",
        f"Email: accounts@{cust.split()[0].lower()}.ae",
        f"VAT: {rng.randint(10 ** 13, 10 ** 14 - 1)}",
        "Description Qty Unit Price Amount",
    ]
    for i in range(n_items):
        q = rng.randint(1, 9)
        p = rng.randint(50, 900)
        lines.append(f"{i + 1} Service item {q} {p}.00 {q * p}.00")
    lines += [
        f"Subtotal: {subtotal}.00",
        f"Tax: {tax}",
        "VAT Rate: 5%",
        f"Grand Total: AED {subtotal + tax}",
        "Payment Terms: Net 30",
        f"PO #: PO-{rng.randint(100, 9999)}",
        f"IBAN: AE{rng.randint(10 ** 19, 10 ** 20 - 1)}",
        "SWIFT: ADCBAEAA",
        f"Account No: {rng.randint(10 ** 9, 10 ** 10 - 1)}",
        "Notes: Thank you for your continued business",
    ]
    return lines


def _purchase_order_lines(rng: random.Random) -> List[str]:
    iy, im, idd = _date(rng, 2023, 2025)
    return [
        "PURCHASE ORDER",
        f"PO No : PO-{rng.randint(1000, 99999)}",
        f"Order Date : {idd:02d}/{im:02d}/{iy}",
        f"Vendor : {rng.choice(COMPANIES)} LLC",
        f"Buyer : {rng.choice(COMPANIES)} LLC",
        "Ship To : Jebel Ali Free Zone, Dubai",
        f"Quantity : {rng.randint(1, 50)}",
        f"Unit Price : {rng.randint(10, 400)}.00",
        f"Total : AED {rng.randint(1000, 90000)}.00",
    ]


def _company_license_lines(rng: random.Random) -> List[str]:
    comp = rng.choice(COMPANIES)
    iy, im, idd = _date(rng, 2021, 2024)
    g1, m1, s1 = _name3(rng)
    return [
        "Trade License",
        "License Type : Commercial",
        f"License No : {rng.randint(600000, 699999)}",
        f"Main License No : {rng.randint(500000, 599999)}",
        f"Register No : {rng.randint(100000, 199999)}",
        f"DCCI No : {rng.randint(80000, 99999)}",
        f"Company Name : {comp} LLC",
        "Legal Type : Limited Liability",
        f"Issue Date : {idd:02d}/{im:02d}/{iy}",
        f"Expiry Date : {idd:02d}/{im:02d}/{iy + 1}",
        f"P.O. Box : {rng.randint(1000, 99999)}",
        f"Phone No : +971 4 {rng.randint(100, 999)} {rng.randint(1000, 9999)}",
        f"Email : info@{comp.split()[0].lower()}.ae",
        "Members",
        f"1 {g1.title()} {s1.title()} Indian Manager {rng.choice([51, 49, 100])}%",
    ]


def _labor_contract_lines(rng: random.Random) -> List[str]:
    iy, im, idd = _date(rng, 2023, 2025)
    return [
        "EMPLOYMENT CONTRACT",
        f"Employee : {' '.join(_name3(rng))}",
        f"Basic Salary : AED {rng.randint(2000, 20000)}",
        f"Start Date : {idd:02d}/{im:02d}/{iy}",
        "Probation Period : six months",
    ]


def _vat_certificate_lines(rng: random.Random) -> List[str]:
    comp = rng.choice(COMPANIES)
    iy, im, idd = _date(rng, 2022, 2024)
    return [
        "FEDERAL TAX AUTHORITY",
        "TAX REGISTRATION CERTIFICATE",
        f"TRN : {rng.randint(10 ** 14, 10 ** 15 - 1)}",
        f"Certificate Number : CR-{iy}-{rng.randint(1000, 9999)}",
        f"Legal Name : {comp} LLC",
        f"Registered Address : Office {rng.randint(100, 999)}, Business Bay, Dubai",
        f"Contact : +971 4 {rng.randint(100, 999)} {rng.randint(1000, 9999)}",
        f"Effective Registration Date : {idd:02d}/{im:02d}/{iy}",
        f"Date of Issue : {idd:02d}/{im:02d}/{iy}",
        f"First VAT Return Period : 01/0{rng.randint(1, 6)}/{iy} to 30/09/{iy}",
    ]


def _visa_cancellation_lines(rng: random.Random) -> List[str]:
    g, md, s = _name3(rng)
    return [
        "APPLICATION FOR CANCELLATION OF VISA",
        f"Name : {g} {md} {s}.",
        f"Passport No : {rng.choice('KL')}{rng.randint(1000000, 9999999)}",
        f"Visa No : {rng.randint(10 ** 10, 10 ** 11 - 1)}",
        "Visa Type : employment",
        f"Sponsor ID : {rng.randint(10 ** 10, 10 ** 11 - 1)}",
        f"Sponsor Name : {rng.choice(COMPANIES)}",
        f"Cancellation Ref : C-{rng.randint(100000, 999999)}",
        "Nationality : INDIAN",
        "Profession : MASON",
        f"Application Number : {rng.randint(10 ** 7, 10 ** 8 - 1)}",
        f"Cancellation Date : {rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/2024",
    ]


def _entry_permit_lines(rng: random.Random) -> List[str]:
    g, md, s = _name3(rng)
    iy, im, idd = _date(rng, 2023, 2025)
    return [
        "ENTRY PERMIT",
        f"Permit Number : EP-{rng.randint(100000, 999999)}",
        f"Visa Number : {rng.randint(10 ** 8, 10 ** 9 - 1)}",
        f"File Number : {rng.randint(100, 999)}/{iy}/{rng.randint(10000, 99999)}",
        f"UID Number : {rng.randint(10 ** 11, 10 ** 12 - 1)}",
        f"Application Number : {rng.randint(10 ** 7, 10 ** 8 - 1)}",
        f"Full Name : {g} {md} {s}",
        "Nationality : INDIAN",
        f"Date of Birth : {rng.randint(1, 28):02d}/{rng.randint(1, 12):02d}/{rng.randint(1965, 2002)}",
        f"Passport Number : {rng.choice('KL')}{rng.randint(1000000, 9999999)}",
        f"Place of Issue : {rng.choice(UAE_CITIES).title()}",
        f"Duration : {rng.choice([30, 60, 90])} days",
        f"Issue Date : {idd:02d}/{im:02d}/{iy}",
        f"Expiry Date : {idd:02d}/{im:02d}/{iy + 1}",
    ]


def _unknown_lines(rng: random.Random) -> List[str]:
    return [" ".join(rng.choice(NOISE_WORDS) for _ in range(rng.randint(4, 8)))
            for _ in range(rng.randint(3, 7))]


TEMPLATES = {
    "PASSPORT": _passport_lines,
    "LABOR_CARD": _labor_card_lines,
    "RESIDENCE_VISA": _residence_visa_lines,
    "EMIRATES_ID": _emirates_id_lines,
    "VISIT_VISA": _visit_visa_lines,
    "HOME_COUNTRY_ID": _home_country_id_lines,
    "INVOICE": _invoice_lines,
    "PURCHASE_ORDER": _purchase_order_lines,
    "COMPANY_LICENSE": _company_license_lines,
    "LABOR_CONTRACT": _labor_contract_lines,
    "COMPANY_VAT_CERTIFICATE": _vat_certificate_lines,
    "VISA_CANCELLATION": _visa_cancellation_lines,
    "ENTRY_PERMIT": _entry_permit_lines,
    "UNKNOWN": _unknown_lines,
}


# ---------------------------------------------------------------------------
# span assembly
# ---------------------------------------------------------------------------

def _chunk(lines: List[str], n: int) -> List[List[str]]:
    n = max(1, min(n, len(lines)))
    size, rem = divmod(len(lines), n)
    chunks, start = [], 0
    for i in range(n):
        end = start + size + (1 if i < rem else 0)
        chunks.append(lines[start:end])
        start = end
    return chunks


def _media_span(doc_id: str, offset: int, lines: List[str], qc: dict,
                rng: random.Random) -> dict:
    tokens = [[i * 20 + 3, rng.randint(2, 40), line, round(rng.uniform(0.78, 0.99), 4)]
              for i, line in enumerate(lines)]
    rng.shuffle(tokens)  # recovery must re-sort by (y, x)
    return {"kind": "media", "text": None,
            "media_ref": encode_media_ref(doc_id, offset, tokens, qc),
            "offset": offset}


def _html_span(doc_id: str, offset: int, lines: List[str],
               rng: random.Random) -> dict:
    """A page chunk republished as a full HTML page: one <p> per printed
    line inside an <article> (positive container keeps short lines), plus
    nav/footer chrome the boilerplate stripper must remove.  Recovery
    (extractors/boilerplate.html_to_page_text) re-joins the lines with
    newlines, so line-oriented extractors see the text-span layout."""
    paragraphs = "".join(
        "<p>" + _htmllib.escape(line) + "</p>" for line in lines)
    nav = "".join(f'<li><a href="/{w}">{w}</a></li>'
                  for w in rng.sample(FILLER_WORDS, 3))
    return {"kind": "html",
            "text": ("<!DOCTYPE html><html><head>"
                     f"<title>{doc_id} p{offset}</title>"
                     "<style>p { margin: 0; }</style>"
                     "<script>var x = 1 < 2;</script></head><body>"
                     f'<header class="masthead"><nav><ul>{nav}</ul></nav>'
                     "</header><!-- chrome ends -->"
                     f'<article class="doc-body">{paragraphs}</article>'
                     '<footer><a href="/terms">terms</a></footer>'
                     "</body></html>"),
            "media_ref": None, "offset": offset}


def make_document(idx: int, seed: int = SEED) -> Dict:
    """One deterministic document row: {doc_id, spans}."""
    rng = random.Random(f"{seed}:{idx}")
    doc_id = f"d{idx:09d}"

    roll = rng.random()
    if roll < 0.02:
        doc_type = "UNKNOWN"
    else:
        pick, acc = rng.random(), 0.0
        doc_type = TYPE_WEIGHTS[-1][0]
        for t, w in TYPE_WEIGHTS:
            acc += w
            if pick < acc:
                doc_type = t
                break

    media_heavy = rng.random() < 0.01
    if media_heavy:
        doc_type = "PASSPORT"  # filler spans are inert for the MRZ extractor
    quality_fail = rng.random() < 0.03
    quality_warn = rng.random() < 0.05
    if quality_fail:
        qc = rng.choice(QC_FAILS)
    elif quality_warn:
        qc = rng.choice(QC_WARNS)
    else:
        qc = dict(QC_GOOD)

    lines = TEMPLATES[doc_type](rng)
    chunks = _chunk(lines, rng.randint(2, 6))

    spans, offset = [], 0
    has_media = False
    for chunk in chunks:
        pick = rng.random()
        if pick < 0.45:
            spans.append(_media_span(doc_id, offset, chunk, qc, rng))
            has_media = True
        elif pick < 0.60:
            spans.append(_html_span(doc_id, offset, chunk, rng))
        else:
            spans.append({"kind": "text", "text": "\n".join(chunk),
                          "media_ref": None, "offset": offset})
        offset += 1

    if quality_fail and not has_media:
        # the gate probes media metrics; force one media span
        spans[-1] = _media_span(doc_id, offset - 1,
                                chunks[-1], qc, rng)

    if media_heavy:
        n_filler = rng.randint(512, 4096)
        for _ in range(n_filler):
            filler = [" ".join(rng.choice(FILLER_WORDS) for _ in range(4))]
            spans.append(_media_span(doc_id, offset, filler, qc, rng))
            offset += 1

    return {"doc_id": doc_id, "spans": spans}


def generate_docs(n_docs: int, seed: int = SEED) -> List[Dict]:
    return [make_document(i, seed) for i in range(n_docs)]


def docs_for_sf(sf: float) -> int:
    """SF tier -> corpus size (sf0.001 -> 100, sf0.01 -> 600, sf0.1 -> 3000)."""
    return max(50, int(round(30000 * sf)))


def write_docs_parquet(path: str, n_docs: int, seed: int = SEED,
                       docs_per_file: int = 250,
                       row_group_rows: int = 50) -> str:
    """Write the corpus as a DIRECTORY of parquet part files.

    A 10^12-document lake is many thousands of files; writing one monolithic
    single-row-group file would give the scan exactly one split and zero
    parallelism.  Small row groups keep intra-file splits meaningful too.
    """
    import os

    os.makedirs(path, exist_ok=True)
    ranges = [(part, start, min(start + docs_per_file, n_docs))
              for part, start in enumerate(range(0, n_docs, docs_per_file))]
    if n_docs >= 20000:  # parallel generation for big bench corpora
        from concurrent.futures import ProcessPoolExecutor
        with ProcessPoolExecutor() as ex:
            list(ex.map(_write_part,
                        [(path, seed, row_group_rows) + r for r in ranges],
                        chunksize=1))
    else:
        for r in ranges:
            _write_part((path, seed, row_group_rows) + r)
    return path


def _write_part(args) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    path, seed, row_group_rows, part, start, end = args
    span_type = pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32()),
    ])
    schema = pa.schema([("doc_id", pa.string()),
                        ("spans", pa.list_(span_type))])
    rows = [make_document(i, seed) for i in range(start, end)]
    pq.write_table(pa.Table.from_pylist(rows, schema=schema),
                   os.path.join(path, f"part-{part:05d}.parquet"),
                   row_group_size=row_group_rows)
