"""Time the Vis train step on the CANONICAL workload (256 px x 512 dirs).

The workload is defined once in ``robir_tpu.tools.vis_workload`` and
shared bit-for-bit with ``bench.py``'s extra mode — rounds 3-4 had two
tools measuring two different ray populations and published two
conflicting numbers for "the Vis step" (61.5 vs 89.6 ms; VERDICT r4
missing #2). The canonical batch is the procedural-dataset camera batch
the real VisRunner produces, fixed seed, hotdog.json model constants.

Prints one JSON line with ms/step (min over reps) plus the full rep list
(spread) and the batch's measured object fraction.

Optional overrides: argv = [compact_after] [blocked 0/1] [quad 0/1]
[compact_chunk]; ROBIR_VIS_OVERRELAX env. For A/B comparisons prefer
tools/vis_ab.py (interleaved across processes, per CLAUDE.md's
relay-variance protocol).
"""

from __future__ import annotations

import json
import os
import sys


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from robir_tpu.tools import vis_workload

    kw = {}
    if len(sys.argv) > 1:
        kw["compact_after"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw["blocked_gather"] = bool(int(sys.argv[2]))
    if len(sys.argv) > 3:
        kw["quad_rows"] = bool(int(sys.argv[3]))
    if len(sys.argv) > 4:
        kw["compact_chunk"] = int(sys.argv[4])
    if os.environ.get("ROBIR_VIS_OVERRELAX"):
        kw["over_relax"] = float(os.environ["ROBIR_VIS_OVERRELAX"])

    runner, batch, carry, info = vis_workload.build(**kw)
    reps_ms = vis_workload.time_step(runner, batch, carry, n_steps=10,
                                     reps=4)
    ms = min(reps_ms)
    print(json.dumps({"metric": "vis_step_ms", "value": round(ms, 2),
                      "reps_ms": [round(t, 2) for t in reps_ms],
                      "px_per_sec": round(info["vis_step_px"] / (ms / 1e3),
                                          1),
                      **info}))


if __name__ == "__main__":
    main()
