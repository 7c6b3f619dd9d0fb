"""Full-model multi-host dryrun: 2 localhost processes x 4 CPU devices each
run the REAL data-parallel Mask R-CNN train step over a process-spanning
mesh with per-host input sharding (jax.distributed.initialize + DCN-style
collectives; SURVEY §2.15). Heavier than the wiring check embedded in
__graft_entry__.dryrun_multichip (it compiles the full train graph twice);
run it manually:

    python scripts/dryrun_multihost.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from maskrcnn_tf2_tpu.parallel.multihost_dryrun import launch

if __name__ == "__main__":
    launch(
        num_processes=2,
        local_devices=4,
        full_model=True,
        timeout=int(sys.argv[1]) if len(sys.argv) > 1 else 3600,
    )
    print("full-model multihost dryrun OK")
