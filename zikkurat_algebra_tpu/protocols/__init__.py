"""Protocol-level pipelines built ONLY on the public kernel APIs — the
analog of the reference's examples/ (KZG commitment scheme, MSM demo),
promoted here to first-class framework components."""
