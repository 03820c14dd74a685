"""Pin the shipped headline plan to its Pareto artifact (VERDICT r3 #4).

The production configuration (``se_snmf_nat_tpu.headline.HEADLINE_PLAN``) is
justified by the measured speed/quality surface checked in as
``PARETO_r0N.json`` (``bench --pareto``).  r3 transcribed the pick by hand;
these tests make artifact<->plan drift impossible:

* the pick recomputed from the LATEST artifact under the documented policy
  must equal the shipped plan field-for-field;
* the shipped point's quality margin over the repo's own stricter 0.993
  regression gate (tests/test_oracle.py) must stay >= MIN_TEST_GATE_MARGIN.

Pick policy (the deliberate margin decision VERDICT r3 #4 asked for, also
implemented in ``cli cmd_bench --pareto``): the pick is the fastest row
clearing BOTH the 0.004 corr margin over the 0.99 gate on BOTH fixtures
AND a worst-fixture corr >= 0.9955 (0.0025 over the repo's own 0.993
regression gate).  There is deliberately NO speed fallback — after two
rounds of "one wobble from red" findings, the flagship plan never ships
inside its own gates' noise; faster thin-margin rows (the DFT-precision
opt-ins) stay recorded in the artifact, not shipped.
"""

from __future__ import annotations

import glob
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
GATE = 0.99                 # the BASELINE golden gate
PICK_MARGIN = 0.004         # pick policy: corr margin over GATE
TEST_GATE = 0.993           # tests/test_oracle.py's stricter headline gate
MIN_TEST_GATE_MARGIN = 0.0025


def latest_pareto():
    paths = sorted(glob.glob(str(REPO / "PARETO_r*.json")))
    assert paths, "no PARETO artifact checked in"
    with open(paths[-1]) as f:
        return json.load(f), pathlib.Path(paths[-1]).name


def recompute_pick(rows):
    ok = [r for r in rows if r["corr_margin"] >= PICK_MARGIN
          and min(r["M03"]["corr"], r["LM"]["corr"])
          >= TEST_GATE + MIN_TEST_GATE_MARGIN]
    assert ok, "no Pareto row clears the pick policy"
    return max(ok, key=lambda r: r["audio_s_per_s"])


def test_headline_plan_matches_pareto_pick():
    from se_snmf_nat_tpu.headline import HEADLINE_PLAN

    art, name = latest_pareto()
    pick = recompute_pick(art["rows"])
    plan_as_row = {
        "k": HEADLINE_PLAN["block_adapt"],
        "cap": HEADLINE_PLAN["block_iter_cap"],
        "bucket": HEADLINE_PLAN["frame_bucket"],
        "refit_cap": HEADLINE_PLAN["block_refit_cap"],
        "fixed_iter": HEADLINE_PLAN["block_fixed_iter"],
        "split": HEADLINE_PLAN.get("block_split_solve", False),
        "refit_fixed": HEADLINE_PLAN.get("block_refit_fixed", False),
        "dft_prec": HEADLINE_PLAN.get("dft_precision") or "highest",
        "idft_prec": HEADLINE_PLAN.get("idft_precision") or "highest",
    }
    pick_fields = {f: pick.get(f, "highest" if f.endswith("prec") else False)
                   for f in plan_as_row}
    assert plan_as_row == pick_fields, (
        f"headline.py HEADLINE_PLAN {plan_as_row} != {name} pick "
        f"{pick_fields} under the documented policy — refresh one of them")


def test_headline_pick_margin_over_test_gate():
    art, name = latest_pareto()
    pick = recompute_pick(art["rows"])
    worst = min(pick["M03"]["corr"], pick["LM"]["corr"])
    assert worst - TEST_GATE >= MIN_TEST_GATE_MARGIN, (
        f"{name} pick corr {worst} sits within {MIN_TEST_GATE_MARGIN} of "
        f"the 0.993 regression gate")
