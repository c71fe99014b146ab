"""Multi-HOST distributed-BA tests: 2 OS processes × 2 virtual CPU devices,
jax.distributed + gloo collectives — the multi-process fake for a multi-host
pod slice (SURVEY.md §4 prescription; BASELINE.md N-host scaling target).

The in-process mesh math is covered by test_dist_ba.py; what this adds is the
PROCESS boundary: global arrays spanning processes and the reduced-camera
psum crossing hosts.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


class TestMultihost:
    @pytest.fixture(scope="class")
    def runs(self):
        port = _free_port()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        root = os.path.dirname(os.path.dirname(WORKER))
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        procs = [
            subprocess.Popen(
                [sys.executable, WORKER, str(i), "2", str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env, cwd=os.path.dirname(os.path.dirname(WORKER)),
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append((p.returncode, out))
        return outs

    def test_both_processes_converge(self, runs):
        for rc, out in runs:
            assert rc == 0, out[-2000:]
        for i, (_, out) in enumerate(runs):
            assert f"MULTIHOST_OK {i}" in out, out[-2000:]

    def test_processes_agree_and_match_single_process(self, runs):
        """The replicated pose solution must be identical across processes,
        and match an in-process (single-host, 4-virtual-device) run of the
        same problem within f32 reduction tolerance."""
        import jax
        from zenslam_tpu.parallel import (
            shard_ba_problem, dist_bundle_adjust, make_ba_mesh)
        from tests.multihost_worker import make_problem

        stats = {}
        for i, (_, out) in enumerate(runs):
            line = [l for l in out.splitlines() if l.startswith(f"proc {i}:")][0]
            parts = line.split()
            stats[i] = dict(cost_after=float(parts[5]),
                            t_sum=float(parts[7]), xyz_sum=float(parts[9]))
        assert stats[0]["t_sum"] == pytest.approx(stats[1]["t_sum"], abs=1e-6)
        assert stats[0]["xyz_sum"] == pytest.approx(stats[1]["xyz_sum"], rel=1e-5)

        mesh = make_ba_mesh(4)
        p = make_problem(4)
        ps = shard_ba_problem(p, 4)
        res = dist_bundle_adjust(ps, mesh, iterations=5)
        t_sum = float(np.abs(np.asarray(res["t"])).sum())
        assert stats[0]["t_sum"] == pytest.approx(t_sum, abs=1e-4)
