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

    # precomp mode (both graph modes gated inside), reference-shaped config
    argv = ["-n", "2000", "-d", "64", "-k", "10", "-t", "6", "-o", "3",
            "--seed", "123"]
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
    assert set(runs) == {"hash", "exact"}, out
    rec["runs"].append({"mode": "precomp", "argv": argv, "s": secs, **runs})

    # query mode: shared TPU-built index, per-rep query on both backends
    argv = ["-n", "2000", "-d", "64", "-k", "10", "-t", "6", "-o", "3",
            "-z", "-y", "50", "--seed", "456"]
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
