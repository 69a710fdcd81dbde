from .schema_catalog import Attribute, Relation, SchemaCatalog, normalize_type
from .cases import MATCHING_CASES, case_catalog_df, cases_values_sql

__all__ = [
    "Attribute",
    "Relation",
    "SchemaCatalog",
    "normalize_type",
    "MATCHING_CASES",
    "case_catalog_df",
    "cases_values_sql",
]
