"""Host-side helpers: int <-> limb conversion, exponent bit planes, timing."""
