"""TPU compute kernels: limb-plane bigint, Montgomery fields, towers,
polynomials/NTT, curves, MSM, pairings.

Everything here is pure JAX (jnp / lax / pallas) operating on uint32
limb-plane arrays of shape ``(L, *batch)`` — the limb axis LEADS so that the
batch axis rides the TPU vector lanes (the analog of the reference's
``lib/cbits`` generated C kernel tree, re-designed for XLA instead of
per-element C loops).
"""
