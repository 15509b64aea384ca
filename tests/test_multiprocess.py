"""Multi-process distributed BA: two OS processes (the multi-HOST analog —
jax.distributed over a coordinator, 2 CPU devices per process, global mesh
of 4) run landmark-sharded bundle adjustment; the Schur psum crosses the
process boundary (DCN path of SURVEY §2.10's north star). Verifies the
distributed result against the single-process solver."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_ba():
    here = os.path.dirname(__file__)
    worker = os.path.join(here, "multiprocess_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=here,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    costs, devs = [], []
    for out in outs:
        m = re.search(r"RESULT pid=\d+ devices=(\d+) cost=([0-9.eE+-]+)", out)
        assert m, f"no RESULT line:\n{out[-2000:]}"
        devs.append(int(m.group(1)))
        costs.append(float(m.group(2)))
    assert devs == [4, 4]               # 2 processes x 2 devices, global
    assert abs(costs[0] - costs[1]) < 1e-3 * max(1.0, abs(costs[0]))

    # reference: single-process solver on the same problem
    sys.path.insert(0, os.path.join(here, ".."))
    from bench_multihost import build_problem
    from hyslam_tpu.solver.ba import bundle_adjustment

    p = build_problem(K=16, L=4096, O=8)
    ref = bundle_adjustment(p, n_iters=8)
    ref_cost = float(ref.cost)
    # same optimum up to reduction order / accept-step divergence
    assert costs[0] <= ref_cost * 1.05 + 1e-3, (costs[0], ref_cost)
