"""THE production/headline enhancement plan, defined once.

bench.py (the driver headline), ``bench --scaling`` (the DP scaling
harness) and ``bench --campaign`` all build the enhancer from here so the
artifacts can never disagree about what the production plan is
(VERDICT r2 weakness 6: the r2 scaling artifact measured the exact scan
and under-reported ~20x).

The configuration is the Pareto pick from ``bench --pareto``
(PARETO_r03.json): the fastest block-adaptive point whose golden-wav
correlation clears the 0.99 gate on BOTH fixtures with >=0.003 margin
(tests/test_oracle.py gates the shipped plan; the K/cap/bucket surface
and the margins are in the artifact).
"""

from __future__ import annotations

# PARETO_r03.json pick: K=44, FIXED 20-iteration H-solves, refit cap 20,
# bucket 176 — ~11.0k au-s/s at golden corr .9944 (M03) / .9957 (LM),
# margin .0044 over the 0.99 gate (and >=.0014 over the repo's stricter
# 0.993 test gate).  The surface behind the pick:
#   * bucket 176 pads the 347-frame bench fixture to 352 instead of 384
#     (-8% dead compute), paying for K=44's 9% more refits vs K=48;
#   * fixed_iter: with a cap, the per-column early stop buys nothing but
#     still costs the per-trip KL cost pass (17% of the loop) — dropping
#     it is FASTER and measured HIGHER-quality at every cap (early-frozen
#     columns now run to the cap, closer to convergence);
#   * the cap cliff: fixed 24/20/18/16/14/12 -> margins .0052/.0044/
#     .0041/.0035/.0025/.0013; 20 is the fastest point with a wobble of
#     buffer over BOTH gates (16 sits .0005 from the test gate — the
#     "one wobble from red" failure mode VERDICT r2 flagged).
HEADLINE_PLAN = dict(
    block_adapt=44,
    frame_bucket=176,
    block_iter_cap=20,
    block_refit_cap=20,
    block_fixed_iter=True,
    dft_matmul=True,
)
HEADLINE_BATCH = 64


def build_headline_enhancer(cfg=None, dtype=None):
    """The enhancer bench.py measures: block-adaptive SNMF-NAT with the
    reference dictionaries, f32, MXU-matmul DFT."""
    import jax.numpy as jnp

    from se_snmf_nat_tpu.config import default_config
    from se_snmf_nat_tpu.io.basis import load_reference_speech_noise
    from se_snmf_nat_tpu.stream.pipeline import SnmfEnhancer

    cfg = cfg or default_config()
    speech, noise = load_reference_speech_noise(cfg.sep.r_d)
    return SnmfEnhancer(cfg, speech.b_dft, noise.b_dft, speech.b_dft,
                        noise.b_dft, dtype=dtype or jnp.float32,
                        **HEADLINE_PLAN)
