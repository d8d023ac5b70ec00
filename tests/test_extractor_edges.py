"""Edge-path parity tests for the quirkiest reference behaviors the main
corpus doesn't exercise: Arabic dictionaries, LL C normalization,
multi-format dates, license member/partner tables, invoice line-item
counter, visit-visa next-line idiom, OCR substitution order.
"""

from ocr_documents_spark.extractors import doc_types as dt


def test_labor_card_arabic_profession_dict():
    # label path: Arabic inside the Profession value maps through the dict
    out = dt.extract_labor_card("Work Permit\nProfession : مهندس مدني department")
    assert out["profession"]["value"] == "Civil Engineer"
    # bare-text path: no label, Arabic anywhere in the text
    out = dt.extract_labor_card("Work Permit\nsome line\nمشرف\n")
    assert out["profession"]["value"] == "Supervisor"
    # longest-key precedence: 'مهندس مدني' must win over bare 'مهندس'
    out = dt.extract_labor_card("Profession : مهندس\n")
    assert out["profession"]["value"] == "Engineer"


def test_labor_card_arabic_nationality_dict():
    out = dt.extract_labor_card("بطاقة عمل\nالجنسية باكستان\n")
    assert out["nationality"]["value"] == "Pakistani"
    out = dt.extract_labor_card("Work card\nCountry bangladesh resident\n")
    assert out["nationality"]["value"] == "Bangladeshi"


def test_labor_card_three_date_shapes():
    # DD/MM/YYYY
    assert dt.extract_labor_card("Expiry 27/01/2023")["expiry_date"]["value"] == "27-Jan-23"
    # YYYY/MM/DD
    assert dt.extract_labor_card("Expiry 2023/01/27")["expiry_date"]["value"] == "27-Jan-23"
    # DD MON YYYY
    assert dt.extract_labor_card("Valid 27 JAN 2023 only")["expiry_date"]["value"] == "27-Jan-23"


def test_residence_visa_llc_normalization():
    """'LL C' (OCR space) and 'LLC' both normalize to 'L.L.C'
    (backend/ocr_service.py:835)."""
    out = dt.extract_residence_visa(
        "RESIDENCE\nSponsor : ALPHA TECHNICAL SERVICES LL C\nU.I.D.No : 123456789\n")
    assert "L.L.C" in out["sponsor"]["value"]
    assert "LL C" not in out["sponsor"]["value"]


def test_residence_visa_uid_cascade_confidences():
    """Labeled UID -> 95.0; bare 9-digit fallback -> 85.0."""
    labeled = dt.extract_residence_visa("U.I.D.No : 987654321")
    assert (labeled["uid_number"]["value"], labeled["uid_number"]["confidence"]) \
        == ("987654321", 95.0)
    bare = dt.extract_residence_visa("ref 987654321 on file")
    assert (bare["uid_number"]["value"], bare["uid_number"]["confidence"]) \
        == ("987654321", 85.0)


def test_residence_visa_date_sort_min_issue_max_expiry():
    out = dt.extract_residence_visa(
        "U.I.D.No : 123456789\nValid 2025/03/01 from 2022/11/15")
    assert out["issue_date"]["value"] == "2022/11/15"
    assert out["expiry_date"]["value"] == "2025/03/01"


def test_company_license_member_and_partner_tables():
    out = dt.extract_company_license(
        "Trade License\nLicense No : 654321\n"
        "Members\n"
        "1 Rahul Sharma Indian Manager 51%\n"
        "2 Amit Patel Indian Partner 49%\n")
    assert out["license_no"]["value"] == "654321"
    members = out.get("members_table")
    assert members is not None  # JSON-string value, matching the reference's
    import json                 # json.dumps behavior (ocr_service.py:1136-1143)
    rows = json.loads(members["value"])
    assert len(rows) == 2
    assert rows[0]["name"].strip() == "Rahul Sharma"
    assert rows[1]["share"] == "49%"


def test_invoice_line_item_counter():
    """Header row (desc+qty+price) found, numeric rows counted until the
    totals row (invoice_extraction_methods.py:214-244)."""
    text = ("ACME LLC\nTAX INVOICE\nInv No: INV-9\n"
            "Description Qty Unit Price Amount\n"
            "1 Widget 2 50.00 100.00\n"
            "2 Gadget 1 75.00 75.00\n"
            "3 Gizmo 4 10.00 40.00\n"
            "Subtotal: 215.00\nGrand Total: AED 225.75\n")
    out = dt.extract_invoice(text)
    assert out["line_items"]["value"] == "3 items"


def test_invoice_ordinal_tax_ids():
    """First tax id -> supplier, second -> customer (ordinal assignment,
    invoice_extraction_methods.py:37-60)."""
    text = ("SUPPLIER LLC\nTAX INVOICE\nInv No: INV-1\n"
            "GST: 1111111111AB\nbilled to :\nCUSTOMER LLC\n"
            "VAT: 22222222222222\nGrand Total: AED 100\n")
    out = dt.extract_invoice(text)
    assert out["supplier_tax_id"]["value"] == "1111111111AB"
    assert out["customer_tax_id"]["value"] == "22222222222222"


def test_visit_visa_next_line_idiom():
    """Entry permit number on the line AFTER its label (lookahead idiom,
    backend/ocr_service.py:420-430)."""
    out = dt.extract_visit_visa(
        "VISIT VISA 30 DAYS\nENTRY PERMIT NO\n1234567890123\nName: A B\n")
    assert out["entry_permit_number"]["value"] == "1234567890123"
    # same-line variant
    out2 = dt.extract_visit_visa(
        "VISIT VISA 30 DAYS\nENTRY PERMIT NO 9876543210987\n")
    assert out2["entry_permit_number"]["value"] == "9876543210987"


def test_passport_ocr_substitution_direction():
    """passport# fixes O->0/I->1; nationality fixes 1->I/0->O — opposite
    directions, both must hold (backend/ocr_service.py:149,180-187)."""
    l1 = "P<1ND" + "SMITH<<JOHN"
    l1 += "<" * (44 - len(l1))
    l2 = "WI4O3565<2IND9609211M3209192064574868122<36"
    out = dt.extract_passport(f"{l1}\n{l2}")
    assert out["nationality"]["value"] == "IND"      # 1 -> I
    assert out["passport_number"]["value"] == "W1403565"  # I->1, O->0
