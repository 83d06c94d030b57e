"""nemar_tpu.ops.attic — measured-LOSING kernel rewrites, kept as archive.

Every module here is a real, parity-tested implementation that an A/B on
the production TPU measured SLOWER than the default lowering it was meant
to replace. They are quarantined (round-4 verdict item: "production +
archive, not six parallel maybes") so the production ops surface stays
small; their flags still work, their tests still run (marked `attic`),
and each docstring carries its measured verdict so the experiment is
never re-run by accident.

| module        | entry flag                 | measured verdict (window A/B)        |
|---------------|----------------------------|--------------------------------------|
| conv_head     | --block_impl pallas_all    | 43 ms vs 21 ms direct (probe r3e7)   |
| conv_small    | (library only)             | scatter form 52 ms vs 21 ms (r3e)    |
| convt_fused   | --block_impl pallas_all    | 12.1 ms vs 7.7 ms XLA convT (r3d/e)  |
| up_conv       | --stn_up_impl fused[_small]| step wash 234.6 vs 233.0 (r3m); grad |
|               |                            | 29.5/30.1 vs 28.0 ms xla (r3r)       |

Also archived-in-place (winning siblings share their file):
  * ops/conv_fact.py `factg` — 268.7 vs 232.9 ms in-step (r3k).
  * ops/norm.py Pallas path — 298 vs 260 ms in-step (r2; its math ships
    as the conv_fused epilogue, which IS production).

Production ops remain: warp, warp_pallas, norm, conv_fused, conv_s2d,
conv_fact (see docs/PARITY.md "measured-losing options" table).
"""
