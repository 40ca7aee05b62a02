#!/usr/bin/env python
"""Cluster job entry point for the flagship KG-construction pipeline.

Submit with::

    ray job submit --working-dir . -- python run_kg_job.py \
        --sf-dir /root/testdata/sf0.01 --out /tmp/kg_out --waves 8

or run directly (``python run_kg_job.py ...`` — initializes a local session
if none exists). The job is RESUMABLE: re-submitting after a failure skips
completed waves via the per-partition lineage manifests
(knowledgeextraction_ray/state/lineage.py) and rebuilds only the final wide
stages from the checkpointed mentions.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="scale dir (corpus cache is derived from its name)")
    ap.add_argument("--out", default="/tmp/kgray_job_out",
                    help="output root (mentions checkpoints + triples)")
    ap.add_argument("--waves", type=int, default=8,
                    help="checkpoint granularity (input-file waves)")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for standalone runs; ignored under a cluster")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False,
              "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from knowledgeextraction_ray.state.lineage import run_resumable_kg

    t0 = time.time()
    report = run_resumable_kg(args.sf_dir, args.out, num_waves=args.waves)
    report["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
