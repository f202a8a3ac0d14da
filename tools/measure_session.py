"""One-process TPU measurement batch.

Remote compiles on the axon relay are per-process (no persistent
compile cache), so each separate profiler invocation pays the full
multi-minute Pallas/XLA compile bill again.  This driver runs the
staged-exposure stage sweep (+'R'-layer sub-stages) and the fill
sub-stage attribution in ONE process: the jit caches
(`l1_to_l2._CORE_CACHE`, `sim_to_l1._FILL_CORE_CACHE`, the Pallas
kernels) are shared, so the second profiler only compiles its few
private micro-stages.

Usage: python tools/measure_session.py [nside]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    nside = sys.argv[1] if len(sys.argv) > 1 else "4096"
    import tools.profile_fill as pf
    import tools.profile_staged as ps

    t0 = time.time()
    print(f"== staged exposure stages + R sub-stages (nside={nside})",
          flush=True)
    sys.argv = ["profile_staged.py", nside, "all"]
    ps.main()
    print(f"[t={time.time()-t0:.0f}s]", flush=True)

    print("== fill sub-stages", flush=True)
    sys.argv = ["profile_fill.py", nside]
    pf.main()
    print(f"[t={time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
