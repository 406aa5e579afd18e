"""Exact error-string catalog of the reference validator.

Every violation string the engine emits must be byte-identical to the
reference's (SURVEY.md §2.1 catalog). Sources (in /root/reference):

- ``Header is required``                      Validator.java:44; validator.rs:80
- ``Schema category is required in header``   Validator.java:50; validator.rs:85
- ``Schema name is required in header``       Validator.java:54; validator.rs:89
- ``Schema version is required in header``    Validator.java:58; validator.rs:93
- ``Schema not found: {category}/{name}``     Validator.java:68
- ``Schema not found: {domain}/{version}/{category}/{name}``
                                              PactsService.java:78-89
- ``Required field missing: {field}``         Validator.java:124; validator.rs:138
- ``Invalid type. Expected: {type}``          Validator.java:141; validator.rs:150
- ``Invalid type for field '{name}'. Expected: {type}``
                                              Validator.java:158; validator.rs:167-170
- ``Validation error: {msg}``                 Validator.java:77
- ``Validation failed: {joined}``             PactsService.java:116-118; service.rs:83
- ``Validation successful``                   ValidationResult.java:73; validator.rs:51
"""

from __future__ import annotations

HEADER_REQUIRED = "Header is required"
CATEGORY_REQUIRED = "Schema category is required in header"
NAME_REQUIRED = "Schema name is required in header"
VERSION_REQUIRED = "Schema version is required in header"
VALIDATION_SUCCESSFUL = "Validation successful"
ERROR_JOINER = "; "


def schema_not_found(category: str, name: str) -> str:
    """Validator-level missing-schema string (Validator.java:68)."""
    return f"Schema not found: {category}/{name}"


def schema_not_found_full(domain: str, version: str, category: str, name: str) -> str:
    """Service-level missing-schema string (PactsService.java:78-89)."""
    return f"Schema not found: {domain}/{version}/{category}/{name}"


def required_field_missing(field: str) -> str:
    """Validator.java:124; validator.rs:138."""
    return f"Required field missing: {field}"


def invalid_type(expected: str) -> str:
    """Top-level type mismatch (Validator.java:141; validator.rs:150)."""
    return f"Invalid type. Expected: {expected}"


def invalid_type_for_field(field: str, expected: str) -> str:
    """Per-property type mismatch (Validator.java:158; validator.rs:167-170)."""
    return f"Invalid type for field '{field}'. Expected: {expected}"


def validation_error(msg: str) -> str:
    """Catch-all wrapper (Validator.java:77)."""
    return f"Validation error: {msg}"


def validation_failed(joined_errors: str) -> str:
    """Gate exception message (PactsService.java:116-118; service.rs:83)."""
    return f"Validation failed: {joined_errors}"
