"""NL->SQL generation + sanitation (the reference's driver-side pipeline)."""
