"""Worker for the 2-process jax.distributed BA test (run by
test_multiprocess.py, one subprocess per SLAM "host"): each process owns a
slice of the landmark axis, the Schur reduction psums across process
boundaries — the DCN analog of BASELINE's "partition keyframes/map blocks
per host" (SURVEY §2.10).

    python multiprocess_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid,
    )
    assert jax.process_count() == nproc
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import numpy as np
    from jax.sharding import Mesh, NamedSharding

    from bench_multihost import build_problem
    from hyslam_tpu.parallel.dist_ba import (
        ba_problem_spec,
        distributed_bundle_adjustment,
    )

    # every process builds the same full problem (same seed), then commits
    # it to the global mesh: each host uploads only its addressable shards
    p = build_problem(K=16, L=4096, O=8)
    devs = np.asarray(jax.devices()).reshape(-1, 1)   # global device list
    mesh = Mesh(devs, ("lm", "model"))
    spec = ba_problem_spec(p)

    def tg(x, s):
        # every process holds the identical full array; device_put against
        # the global sharding uploads just this host's addressable shards
        return jax.device_put(np.asarray(x), NamedSharding(mesh, s))

    p_global = p._replace(
        kf_Tcw=tg(p.kf_Tcw, spec.kf_Tcw),
        kf_fixed=tg(p.kf_fixed, spec.kf_fixed),
        cams=type(p.cams)(*[tg(x, s) for x, s in zip(p.cams, spec.cams)]),
        lm_pos=tg(p.lm_pos, spec.lm_pos),
        lm_valid=tg(p.lm_valid, spec.lm_valid),
        obs=type(p.obs)(*[tg(x, s) for x, s in zip(p.obs, spec.obs)]),
    )
    res = distributed_bundle_adjustment(p_global, mesh, n_iters=8)
    cost = float(res.cost)
    n_inl = int(jax.device_get(res.obs_inlier.sum()))
    print(f"RESULT pid={pid} devices={len(jax.devices())} "
          f"cost={cost:.6f} inliers={n_inl}", flush=True)


if __name__ == "__main__":
    main()
