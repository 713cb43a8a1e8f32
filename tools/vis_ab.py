"""Interleaved A/B Vis-step measurement on the canonical workload.

CLAUDE.md's relay-variance protocol: the same binary+inputs can read 2x
apart across runs in some modes, so config comparisons must interleave
A/B reps within a process AND repeat across processes, taking the min per
config. This tool does exactly that for the canonical Vis workload
(robir_tpu/tools/vis_workload.py) over a set of grid-march tuning configs
— the instrument for the round-5 compact_after/compact_chunk re-sweep
(VERDICT r4 next #1).

Usage:
  python tools/vis_ab.py a4,a8,a16            # sweep compact_after
  python tools/vis_ab.py a4c512,a4c1024 --procs 3
  python tools/vis_ab.py --child a4,a8        # one child process (internal)

Config spec tokens: aN = compact_after N, cN = compact_chunk N,
q0/q1 = quad_rows off/on. Example: "a8c512q1".

Parent output: one JSON line per config with min + all samples across all
processes.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_spec(spec: str) -> dict:
    kw = {}
    for key, grp in (("compact_after", "a"), ("compact_chunk", "c")):
        m = re.search(grp + r"(\d+)", spec)
        if m:
            kw[key] = int(m.group(1))
    m = re.search(r"q([01])", spec)
    if m:
        kw["quad_rows"] = bool(int(m.group(1)))
    return kw


def run_child(specs: list[str], n_steps: int, reps: int) -> None:
    from robir_tpu.tools import vis_workload

    # build every config's workload first (sharing one baked grid where
    # the bake-relevant fields match), then INTERLEAVE timed reps A,B,...
    built = []
    bake_cache = {}
    for spec in specs:
        kw = parse_spec(spec)
        runner, batch, carry, info = vis_workload.build(**kw)
        bake_key = (runner.cfg.grid.resolution, runner.cfg.grid.quad_rows,
                    runner.cfg.grid.storage_dtype)
        if bake_key in bake_cache:
            # identical grid content — drop the duplicate device buffer
            gv = bake_cache[bake_key]
            carry = carry[:-1] + (gv,)
            runner.grid_values = gv
        else:
            bake_cache[bake_key] = carry[-1]
        built.append((spec, runner, batch, carry, info))

    # one warmup (compile) pass each, then interleaved timed reps
    from robir_tpu.tools.vis_workload import time_step

    samples = {spec: [] for spec, *_ in built}
    for r in range(reps):
        for spec, runner, batch, carry, info in built:
            ms = time_step(runner, batch, carry, n_steps=n_steps, reps=1)
            samples[spec].extend(ms)
    print(json.dumps({"samples": samples,
                      "object_frac": built[0][4]["vis_step_object_frac"]}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("specs", help="comma-separated config specs (a4,a8,...)")
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3,
                    help="interleaved rounds per process")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    specs = args.specs.split(",")

    if args.child:
        run_child(specs, args.steps, args.reps)
        return

    merged = {s: [] for s in specs}
    obj_frac = None
    for p in range(args.procs):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), args.specs,
                 "--child", "--steps", str(args.steps), "--reps",
                 str(args.reps)],
                capture_output=True, text=True, timeout=args.timeout)
        except subprocess.TimeoutExpired:
            # the relay wedges for minutes-to-hours at a time; a hung
            # child must not kill the whole sweep — later procs may land
            print(f"proc {p}: timed out after {args.timeout}s",
                  file=sys.stderr)
            continue
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not lines:
            print(f"proc {p}: rc={proc.returncode} "
                  f"stderr: {proc.stderr[-400:]}", file=sys.stderr)
            continue
        out = json.loads(lines[-1])
        obj_frac = out.get("object_frac")
        for s, v in out["samples"].items():
            merged[s].extend(v)
    for s in specs:
        v = merged[s]
        print(json.dumps({
            "config": s,
            "min_ms": round(min(v), 2) if v else None,
            "samples_ms": [round(x, 2) for x in v],
            "object_frac": obj_frac}), flush=True)


if __name__ == "__main__":
    main()
