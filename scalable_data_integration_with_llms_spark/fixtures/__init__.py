"""Committed data fixtures: the reference's EHR benchmark + generated
goldens (tools/golden_ehr.py)."""
