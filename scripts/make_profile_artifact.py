"""Assemble PROFILE_r0N.json from same-session end-to-end ablations.

Runs scripts/bench_ablate.py once per stage in a fresh process (one
stage per process — jit caches), on the synthetic texture and on the
real houses.jpg workload, and writes the stage cost map.  Ablation
deltas are the honest stage costs on this platform (prefix profilers
and micro-benches lie — CLAUDE.md).

Usage (TPU): python scripts/make_profile_artifact.py --out PROFILE_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SYNTH_STAGES = ["none", "sample", "owin", "okernel", "desc", "scale",
                "detect", "match", "mips", "scanvas", "oarena"]
HOUSES_STAGES = ["none", "sample", "oarena", "scanvas"]


def run_stage(stage: str, houses: bool) -> tuple[float, float]:
    env = dict(os.environ)
    if houses:
        env["LF_BENCH_IMAGE"] = "houses"
    else:
        env.pop("LF_BENCH_IMAGE", None)
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "bench_ablate.py"), stage],
        env=env, capture_output=True, text=True, timeout=1800)
    m = re.search(r"ABLATE\s+\S+\s+([0-9.]+) ms/batch\s+([0-9.]+) fps",
                  out.stdout)
    if not m:
        raise RuntimeError(f"{stage} (houses={houses}): no result\n"
                           f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return float(m.group(1)), float(m.group(2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PROFILE_r05.json")
    args = ap.parse_args()

    results = {"synth": {}, "houses": {}}
    for houses, stages in ((False, SYNTH_STAGES), (True, HOUSES_STAGES)):
        key = "houses" if houses else "synth"
        for s in stages:
            ms, fps = run_stage(s, houses)
            results[key][s] = {"ms_per_batch": ms, "fps": fps}
            print(json.dumps({"workload": key, "stage": s,
                              "ms_per_batch": ms, "fps": fps}), flush=True)

    def deltas(d):
        base = d["none"]["ms_per_batch"]
        return {s: round(base - v["ms_per_batch"], 2)
                for s, v in d.items() if s != "none"}

    artifact = {
        "method": ("end-to-end stage ablation (scripts/bench_ablate.py): "
                   "the EXACT bench step with one stage's output replaced "
                   "by a patterned fake, dependency-chained timing, one "
                   "host fetch; delta vs the un-ablated run is the "
                   "stage's true end-to-end cost.  All numbers "
                   "same-session; run-to-run noise ~1-1.5 ms."),
        "config": ("v5e, 640x480, batch 8, 2000 keypoints; round-5 state "
                   "(reachable-level-trimmed sampler canvas, merge-mode "
                   "BA packing upstream)"),
        "raw": results,
        "stage_cost_ms_synth": deltas(results["synth"]),
        "stage_cost_ms_houses": deltas(results["houses"]),
        "construction_glue_ms_synth": round(
            sum(results["synth"]["none"]["ms_per_batch"]
                - results["synth"][s]["ms_per_batch"]
                for s in ("mips", "scanvas", "oarena")), 2),
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
