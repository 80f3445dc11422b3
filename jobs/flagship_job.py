"""Cluster job entrypoint for the flagship span-assignment pipeline.

Submit to a running Ray cluster (the north rule's execution mode):

    ray job submit --working-dir . -- \
        python jobs/flagship_job.py --input /data/docs --out /shared/out

or run standalone on one node (auto-inits local Ray).  The job is
RESUMABLE: partitions are keyed on the deterministic input file index and
committed with per-partition lineage manifests (state/checkpoint.py), so
re-submitting the same command after a crash skips finished partitions at
the source.  ``--out`` must be on a filesystem all workers share.

Prints one JSON line with throughput + partition counts (the same shape
bench.py emits) so job logs are machine-readable.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="documents table: parquet file/dir (Lance dataset "
                         "when the lance package is available)")
    ap.add_argument("--out", required=True,
                    help="output directory (shared filesystem on clusters)")
    ap.add_argument("--resolution", type=int, default=9)
    ap.add_argument("--zone-on-cell", action="store_true",
                    help="record per-file [min,max] representative-cell "
                         "zones in the lineage manifests so regional "
                         "reads of the output prune at the file level "
                         "(read_checkpointed_pruned)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        # inside `ray job submit` this connects to the hosting cluster;
        # standalone it starts a local one
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto")
                 if os.environ.get("RAY_ADDRESS") else "local",
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")

    from dggrid4py_ray.pipelines.highlevel import run_flagship_checkpointed

    t0 = time.time()
    out_dir = run_flagship_checkpointed(args.input, args.out,
                                        resolution=args.resolution,
                                        zone_on_cell=args.zone_on_cell)
    sec = time.time() - t0
    manifests = glob.glob(os.path.join(out_dir, "part-*", "manifest.json"))
    rows = 0
    for m in manifests:
        with open(m) as f:
            rows += json.load(f).get("rows", 0)
    print(json.dumps({"metric": "cell_assignments_per_sec",
                      "value": round(rows / sec, 1) if sec else None,
                      "unit": "sec", "seconds": round(sec, 2),
                      "rows": rows, "partitions": len(manifests),
                      "out": out_dir,
                      "resolution": args.resolution}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
