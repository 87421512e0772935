#!/usr/bin/env python
"""Run the TPU-vs-CPU parity gate on the real TPU and record the output as
a committed artifact (round-1 VERDICT item 4: the harness was CI-tested
only CPU-vs-CPU; this captures a real accelerator run).

Role of ``/root/reference/compare_results.c:122-171``.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/record_parity_tpu.py
Writes: baselines/parity_tpu.json
"""

from __future__ import annotations

import contextlib
import io
import json
import pathlib
import platform
import re
import time


def run(argv):
    from approximatenn_tpu.harness import compare_results

    buf = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(buf):
        rc = compare_results.main(argv)
    assert rc == 0, rc
    return buf.getvalue(), round(time.perf_counter() - t0, 1)


def main():
    import jax

    acc = jax.devices()[0]
    rec = {
        "harness": "approximatenn_tpu.harness.compare_results",
        "accelerator": str(acc.platform),
        "device": repr(acc),
        "host": platform.node(),
        "date": time.strftime("%Y-%m-%d"),
        "runs": [],
    }
    assert acc.platform != "cpu", "no accelerator attached — artifact would be CPU-vs-CPU"

    # precomp mode (both graph modes gated inside), reference-shaped
    # config, with the f64-oracle arbitration and the acceptance band
    # (round-2 VERDICT item 4: numbers without thresholds or attribution
    # can drift).  Band rationale: hash-mode diffs are bucket-boundary
    # sign flips — two valid approximations — so the band is generous
    # (4% of ids); the sharp exact-mode gates (real-diff fraction and
    # oracle-recall gap) are asserted below from the arbitration output.
    BAND = 0.04
    argv = ["-n", "2000", "-d", "64", "-k", "10", "-t", "6", "-o", "3",
            "--seed", "123", "--arbitrate", "--max-diff-frac", str(BAND)]
    out, secs = run(argv)
    runs = {}
    for m in re.finditer(
        r"\[graph_mode=(\w+)\] Average graph diff count: ([\d.e+-]+) "
        r"\(of (\d+) ids\); float diff \(1024-ULP units\): ([\d.e+-]+)",
        out,
    ):
        runs[m.group(1)] = {
            "graph_diff_mean": float(m.group(2)),
            "of_ids": int(m.group(3)),
            "float_diff_1024ulp": float(m.group(4)),
        }
    for m in re.finditer(
        r"\[graph_mode=(\w+)\] arbitration \(f64 oracle\): "
        r"oracle-recall acc=([\d.]+) cpu=([\d.]+); diff ids "
        r"tie_f64=([\d.e+-]+) tie_f32=([\d.e+-]+) real=([\d.e+-]+)",
        out,
    ):
        runs[m.group(1)]["arbitration"] = {
            "oracle_recall_acc": float(m.group(2)),
            "oracle_recall_cpu": float(m.group(3)),
            "diff_tie_f64": float(m.group(4)),
            "diff_tie_f32": float(m.group(5)),
            "diff_real": float(m.group(6)),
        }
    assert set(runs) == {"hash", "exact"}, out
    assert all("arbitration" in v for v in runs.values()), out

    # the teeth: exact mode compares two exhaustive f32 searches, so any
    # id diff must be tie-equivalent at f32 resolution (the qn+pn-2qp
    # cancellation-ordering attribution) — real diffs <= 0.2% of ids and
    # no backend measurably closer to the f64 truth than the other
    ex = runs["exact"]["arbitration"]
    assert ex["diff_real"] / runs["exact"]["of_ids"] <= 0.002, ex
    assert abs(ex["oracle_recall_acc"] - ex["oracle_recall_cpu"]) <= 0.005, ex
    # hash mode: the diffs are algorithmic (sign flips near bucket
    # boundaries select different candidate sets); the gate is EQUAL
    # QUALITY, not equal ids
    hs = runs["hash"]["arbitration"]
    assert abs(hs["oracle_recall_acc"] - hs["oracle_recall_cpu"]) <= 0.01, hs
    rec["band"] = {
        "max_diff_frac": BAND,
        "exact_max_real_diff_frac": 0.002,
        "max_oracle_recall_gap": {"exact": 0.005, "hash": 0.01},
    }
    rec["runs"].append({"mode": "precomp", "argv": argv, "s": secs, **runs})

    # query mode: shared TPU-built index, per-rep query on both backends
    # (band: measured 0.33% at this config; 2% catches regressions)
    argv = ["-n", "2000", "-d", "64", "-k", "10", "-t", "6", "-o", "3",
            "-z", "-y", "50", "--seed", "456", "--max-diff-frac", "0.02"]
    out, secs = run(argv)
    m = re.search(r"Average query diff count: ([\d.e+-]+) \(of (\d+) ids\)", out)
    assert m, out
    rec["runs"].append({
        "mode": "query", "argv": argv, "s": secs,
        "query_diff_mean": float(m.group(1)), "of_ids": int(m.group(2)),
    })

    path = pathlib.Path(__file__).resolve().parent.parent / "baselines" / "parity_tpu.json"
    path.write_text(json.dumps(rec, indent=2) + "\n")
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
