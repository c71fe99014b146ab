"""Multi-HOST (multi-process) execution scaffold.

SURVEY.md §2.5 / BASELINE.md target the reference's missing distributed axis:
map/keyframe sharding across a multi-host TPU pod slice, landmark elimination
local per shard, the reduced camera system psum-reduced over ICI within a
slice and DCN across slices. `parallel/dist_ba.py` implements the math over a
device mesh; this module adds the PROCESS layer:

- `init_multihost`: jax.distributed bootstrap (call BEFORE any backend use —
  this environment's sitecustomize latches platforms at first device touch,
  so platform forcing goes through jax.config, not env vars).
- `distribute_ba_problem`: turn a host-replicated, shard-ordered BAProblem
  (from `shard_ba_problem`) into GLOBAL jax.Arrays laid out on the mesh —
  landmark/observation blocks land on their owning process, poses replicated.
- `gather_landmarks`: collect the sharded landmark estimate back to every
  host after optimization.

On a real pod slice the same code runs with the TPU platform and the mesh
axis rides ICI/DCN; the multi-process CPU path (gloo collectives) is the
test harness prescribed by SURVEY.md §4 ("multi-host tests via
jax.distributed … multi-process CPU fakes").
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zenslam_tpu.backend.ba import BAProblem


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None,
                   platform: str | None = None,
                   local_device_count: int | None = None) -> None:
    """Initialize jax.distributed for an N-process run.

    Must run before ANY jax backend use. platform="cpu" +
    local_device_count=k gives each process k virtual CPU devices (the
    multi-process test fake); on a real pod slice leave both None and the
    TPU runtime provides the topology.
    """
    import os

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{local_device_count}").strip()
    if platform is not None:
        jax.config.update("jax_platforms", platform)
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_ba_mesh() -> Mesh:
    """1-D map-shard mesh over ALL global devices (every process's)."""
    return Mesh(np.asarray(jax.devices()), ("m",))


def _make_global(mesh: Mesh, spec: P, full: np.ndarray):
    """Global jax.Array with sharding ``spec`` from a host-REPLICATED full
    array (each process holds the same full copy; each device keeps only its
    addressable shard)."""
    sharding = NamedSharding(mesh, spec)
    full = np.asarray(full)
    return jax.make_array_from_callback(
        full.shape, sharding, lambda idx: full[idx])


def distribute_ba_problem(p: BAProblem, mesh: Mesh) -> BAProblem:
    """Lay a shard-ordered BAProblem (see `shard_ba_problem`, which must have
    been called with n_shards == total device count) onto the global mesh:
    landmarks/observations sharded on axis 0, everything else replicated."""
    sharded_fields = {"xyz", "lm_valid", "obs_kf", "obs_lm", "obs_uv",
                      "obs_cam", "obs_valid"}
    out = {}
    for name, val in p._asdict().items():
        spec = P("m") if name in sharded_fields else P()
        out[name] = _make_global(mesh, spec, val)
    return BAProblem(**out)


def gather_landmarks(xyz) -> np.ndarray:
    """All-gather a landmark array sharded over processes back to the host
    (pose outputs are replicated already)."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(xyz, tiled=True))
