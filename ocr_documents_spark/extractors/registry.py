"""Effective document-type registry.

The reference's ``backend/config.py`` declares ``DOCUMENT_TYPES`` with four
duplicate keys (RESIDENCE_VISA, INVOICE, PURCHASE_ORDER, COMPANY_LICENSE).
Python dict literals are last-one-wins, so the *effective* registry the app
runs with has 13 unique types whose field lists come from the **later**
definitions (reference: backend/config.py:98 vs :124, :153 vs :251,
:167 vs :233, :183 vs :270 — see SURVEY.md §0.1.3).  This module encodes the
post-overwrite registry directly; it is the single source of truth for

* the set of valid document types,
* the expected-field lists that drive the completed/partial status threshold
  (reference: backend/ocr_service.py:1636-1646, 30% rule at :1641),
* the config-pattern fallback tables used by the LABOR_CONTRACT and
  PURCHASE_ORDER extractors (reference dispatch at backend/ocr_service.py:331
  and :379 targets methods that do not exist; we implement the intended
  config-driven fallback, see SURVEY.md §0.1.1).
"""

from __future__ import annotations

# 13 effective types, field lists per the post-overwrite config.
EXPECTED_FIELDS: dict[str, list[str]] = {
    "PASSPORT": [
        "surname", "given_name", "full_name", "date_of_birth",
        "place_of_birth", "gender", "nationality", "passport_number",
        "issue_date", "expiry_date", "issue_place", "country_code",
    ],
    "LABOR_CARD": [
        "full_name", "father_name", "date_of_birth", "nationality",
        "gender", "work_permit_number", "issue_date", "expiry_date",
        "file_number", "company_name", "position", "salary",
        "contract_duration", "work_location", "sponsor_name",
        "sponsor_id", "issue_authority", "passport_number",
    ],
    # later duplicate wins (config.py:124)
    "RESIDENCE_VISA": [
        "full_name", "date_of_birth", "nationality", "gender",
        "passport_number", "residence_permit_number", "issue_date",
        "expiry_date", "visa_type", "sponsor_name", "sponsor_id",
        "relationship", "entry_date", "port_of_entry", "profession",
        "marital_status", "place_of_issue",
    ],
    "EMIRATES_ID": [
        "full_name", "id_number", "card_number", "date_of_birth",
        "nationality", "gender", "issue_date", "expiry_date",
        "employer_name", "issue_authority",
    ],
    "VISIT_VISA": [
        "visa_type_duration", "entry_permit_number", "date_place_of_issue",
        "uid_number", "full_name", "nationality", "place_of_birth",
        "date_of_birth", "passport_number", "profession",
    ],
    # later duplicate wins (config.py:251)
    "INVOICE": [
        "invoice_number", "invoice_date", "due_date", "reference_number",
        "seller_company", "seller_address", "seller_tax_id", "seller_contact",
        "buyer_name", "buyer_address", "buyer_tax_id", "buyer_contact",
        "item_description", "quantity", "unit_price", "total_per_item",
        "subtotal", "tax_amount", "discount", "total_amount_due",
        "amount_paid", "balance_due", "payment_terms", "payment_method",
        "bank_details", "currency",
    ],
    # later duplicate wins (config.py:233)
    "PURCHASE_ORDER": [
        "po_number", "po_date", "reference_number", "vendor_name",
        "vendor_id", "vendor_address", "vendor_contact", "vendor_tax_id",
        "buyer_company", "buyer_address", "buyer_contact", "buyer_department",
        "item_description", "quantity", "unit_price", "total_per_item",
        "subtotal", "tax_amount", "discount", "total_amount",
        "payment_terms", "delivery_date", "shipping_address", "currency",
    ],
    # later duplicate wins (config.py:270)
    "COMPANY_LICENSE": [
        "license_type", "license_no", "main_license_no", "register_no",
        "dcci_no", "duns_no", "company_name", "company_name_ar",
        "business_name", "legal_type", "issue_date", "expiry_date",
        "address", "po_box", "phone", "fax", "mobile", "parcel_id", "email",
        "members_table", "partners_table",
    ],
    "LABOR_CONTRACT": [
        "employee_name", "employee_passport", "employee_nationality",
        "employee_dob", "employer_name", "employer_license", "employer_contact",
        "contract_start_date", "contract_duration", "probation_period",
        "basic_salary", "housing_allowance", "transport_allowance",
        "total_package", "annual_leave_days", "ticket_allowance",
        "medical_insurance", "notice_period", "end_of_service_benefits",
        "working_hours", "position", "job_description", "work_location",
    ],
    "HOME_COUNTRY_ID": [
        "full_name", "father_name", "mother_name", "date_of_birth",
        "place_of_birth", "gender", "id_number", "aadhaar_number",
        "issue_date", "issue_authority", "permanent_address",
        "district", "state", "pin_code", "mobile_number",
        "biometric_ref", "qr_code_data",
    ],
    "COMPANY_VAT_CERTIFICATE": [
        "registration_number", "certificate_number", "legal_name_english",
        "legal_name_arabic", "registered_address", "contact_number",
        "effective_registration_date", "date_of_issue",
        "first_vat_return_period", "vat_return_due_date", "tax_period_start_end",
    ],
    "VISA_CANCELLATION": [
        "full_name", "passport_number", "nationality", "date_of_birth",
        "visa_type", "visa_number", "issuing_emirate", "profession",
        "sponsor_name", "sponsor_id", "establishment_number",
        "cancellation_date", "cancellation_ref", "application_number",
    ],
    "ENTRY_PERMIT": [
        "permit_number", "visa_number", "file_number", "uid_number",
        "application_number", "reference_number", "full_name", "nationality",
        "gender", "date_of_birth", "passport_number", "passport_issue_date",
        "passport_expiry_date", "passport_issue_place", "permit_type",
        "permit_category", "entry_type", "number_of_entries", "duration",
        "issue_date", "expiry_date", "valid_from", "valid_until",
        "port_of_entry", "purpose_of_visit", "sponsor_name", "sponsor_id",
        "employer_name", "job_title", "email", "phone", "address",
        "status", "approval_status", "issued_by", "issuing_office",
        "qr_code", "barcode_number",
    ],
}

DOCUMENT_TYPE_NAMES: tuple[str, ...] = tuple(EXPECTED_FIELDS)

# Config-pattern fallback tables for the two types whose dedicated extractor
# methods never existed in the reference (intended logic per SURVEY.md §2.6
# T12/T13).  Values are ordered regex cascades consumed by the generic
# first-match extractor (reference: backend/ocr_service.py:63-77).
FALLBACK_FIELD_PATTERNS: dict[str, dict[str, list[str]]] = {
    # reference: backend/config.py:210-213 (only definition)
    "LABOR_CONTRACT": {
        "basic_salary": [r"basic\s*salary\s*[:\-]?\s*(AED|USD)?\s*(\d{1,10})"],
        "contract_start_date": [
            r"start\s*date\s*[:\-]?\s*(\d{1,2}[\/\-\.]\d{1,2}[\/\-\.]\d{2,4})"
        ],
    },
    # reference: backend/config.py:245-248 (later duplicate wins)
    "PURCHASE_ORDER": {
        "po_number": [
            r"po\s*no\.?\s*[:\-]?\s*([A-Z0-9\-]{4,20})",
            r"purchase\s*order\s*[:\-]?\s*([A-Z0-9\-]{4,20})",
        ],
        "total_amount": [r"total\s*[:\-]?\s*([A-Z]{3})?\s*(\d{1,15}\.?\d{0,2})"],
    },
}

# Status thresholds (reference: backend/ocr_service.py:1641, backend/main.py:162)
COMPLETED_FIELD_FRACTION = 0.3
CLASSIFY_MIN_CONFIDENCE = 40.0

# The v1 ``GET /api/document-types`` whitelist (backend/main_v1.py:86-96):
# of the 13 effective types, only these are advertised to clients.
SUPPORTED_TYPES: tuple[str, ...] = (
    "PASSPORT", "LABOR_CARD", "RESIDENCE_VISA", "EMIRATES_ID",
    "HOME_COUNTRY_ID", "VISIT_VISA", "INVOICE", "PURCHASE_ORDER",
    "COMPANY_LICENSE",
)


def list_document_types() -> list[dict]:
    """S: the ``/api/document-types`` response — supported types with their
    expected-field inventories (backend/main_v1.py:82-116)."""
    return [{"type": t, "n_fields": expected_field_count(t),
             "fields": list(EXPECTED_FIELDS[t])}
            for t in SUPPORTED_TYPES]


def expected_field_count(document_type: str) -> int:
    return len(EXPECTED_FIELDS.get(document_type, ()))
