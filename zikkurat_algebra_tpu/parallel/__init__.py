"""Multi-chip scale-out: mesh construction, sharded MSM / NTT / vector ops.

The reference has NO parallelism (single-threaded C, SURVEY.md §2.4); this
package is first-class new work: domain decomposition over a
`jax.sharding.Mesh`, with XLA collectives (psum / all_gather / all_to_all)
riding ICI instead of function calls."""
