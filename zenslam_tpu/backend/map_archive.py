"""Host-spill landmark archive with frustum-gated reload-on-revisit.

SURVEY §5 map-scaling axis (VERDICT r2 item 7): the live `LandmarkMap` is a
fixed-capacity (default 8192) LRU table — under slot pressure, landmarks
from earlier parts of the trajectory are recycled, and on revisit the
tracker could only re-anchor through loop-closure keyframe snapshots. The
reference has the same working-set idea (50 m radius cap,
`tracking_options.h:14`) but its `std::map` never forgets; this module
restores never-forgets semantics at fixed device memory:

- SPILL (host): every keyframe, the live map is synced into a growable
  host archive keyed by (slot, generation) — BA-refined positions are
  upserted, recycled slots are detected by generation mismatch and their
  rows marked dormant. One ~350 KB device->host read per keyframe.
- RELOAD (host gate + jitted insert): dormant archived landmarks that
  project into the current frustum (predicted pose, numpy — the archive
  lives on host) are re-inserted into the live table through the same
  LRU allocator the front-end uses, with fresh generations. The next
  frame's association matmul then re-associates them exactly like any
  live landmark.

The device never sees a dynamic shape: reload candidates are padded to a
fixed batch (`reload_max`), and the insert is one jitted call.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from zenslam_tpu.frontend.tables import allocate_landmark_slots


@functools.partial(jax.jit, static_argnames=())
def reload_into_map(lmap, xyz, desc, valid, frame_idx, color=None,
                    protect_recent: int = 2):
    """Insert (reload_max,)-padded archived landmarks into free/LRU slots.

    Landmarks seen within the last ``protect_recent`` frames are protected
    from eviction (the live working set wins over history). Returns
    (new_lmap, slots (K,) int32, placed (K,) bool).
    """
    protect = lmap.valid & (lmap.last_seen >= frame_idx - protect_recent)
    score = jnp.where(valid, 1.0, -jnp.inf)
    slot, placed = allocate_landmark_slots(lmap.valid, lmap.last_seen,
                                           protect, score, valid)
    sl = jnp.where(placed, slot, lmap.valid.shape[0])
    if color is None:
        color = jnp.zeros(xyz.shape[0], jnp.float32)
    lmap = lmap._replace(
        xyz=lmap.xyz.at[sl].set(xyz, mode="drop"),
        desc=lmap.desc.at[sl].set(desc, mode="drop"),
        valid=lmap.valid.at[sl].set(placed, mode="drop"),
        last_seen=lmap.last_seen.at[sl].set(frame_idx, mode="drop"),
        n_obs=lmap.n_obs.at[sl].set(1, mode="drop"),
        generation=lmap.generation.at[sl].add(1, mode="drop"),
        color=lmap.color.at[sl].set(color, mode="drop"),
    )
    return lmap, slot, placed


class LandmarkArchive:
    """Growable host-side landmark store (numpy). Not a pytree — owned by
    the host `SlamSystem` next to the keyframe DB."""

    def __init__(self, desc_shape=(8,), desc_dtype=np.uint32):
        self.xyz = np.zeros((0, 3), np.float32)
        self.color = np.zeros(0, np.float32)
        self.desc = np.zeros((0,) + tuple(desc_shape), desc_dtype)
        self.dormant = np.zeros(0, bool)       # True = not in the live map
        self._key_to_row = {}                  # (slot, generation) -> row
        self._row_key = []                     # row -> live key or None
        self.n_reloads = 0
        self.n_spills = 0
        self.reload_keys = set()               # (slot, gen) created by reload

    def __len__(self):
        return len(self.xyz)

    def sync(self, lmap) -> None:
        """Upsert the live map into the archive; mark recycled rows dormant.

        Call per keyframe with the current (device) LandmarkMap."""
        valid = np.asarray(lmap.valid)
        xyz = np.asarray(lmap.xyz)
        desc = np.asarray(lmap.desc)
        gen = np.asarray(lmap.generation)
        col = np.asarray(lmap.color)

        live_keys = set()
        new_rows = []
        for slot in np.nonzero(valid)[0]:
            key = (int(slot), int(gen[slot]))
            live_keys.add(key)
            row = self._key_to_row.get(key)
            if row is None:
                new_rows.append((key, xyz[slot], desc[slot], col[slot]))
            else:
                self.xyz[row] = xyz[slot]      # BA refinements flow in
        if new_rows:
            base = len(self.xyz)
            self.xyz = np.concatenate(
                [self.xyz, np.stack([r[1] for r in new_rows])])
            self.desc = np.concatenate(
                [self.desc, np.stack([r[2] for r in new_rows])])
            self.color = np.concatenate(
                [self.color, np.asarray([r[3] for r in new_rows], np.float32)])
            self.dormant = np.concatenate(
                [self.dormant, np.zeros(len(new_rows), bool)])
            for i, (key, *_rest) in enumerate(new_rows):
                self._key_to_row[key] = base + i
                self._row_key.append(key)
        # recycled slots: key no longer current -> dormant
        for key in list(self._key_to_row.keys()):
            if key not in live_keys:
                row = self._key_to_row.pop(key)
                if not self.dormant[row]:
                    self.dormant[row] = True
                    self.n_spills += 1
                self._row_key[row] = None

    def reload(self, lmap, R_cw, t_cw, cam, frame_idx,
               reload_max: int = 128, radius: float = 50.0,
               margin: float = 0.0):
        """Frustum-gated reload of dormant landmarks near the current pose.

        Returns the updated LandmarkMap (unchanged object if nothing to
        reload). ``cam`` is the left PinholeCamera; ``radius`` ≡ the
        reference's landmark search-radius cap (`tracking_options.h:14`)."""
        if not self.dormant.any():
            return lmap
        rows = np.nonzero(self.dormant)[0]
        X = self.xyz[rows]
        R = np.asarray(R_cw, np.float32)
        t = np.asarray(t_cw, np.float32)
        xc = X @ R.T + t
        z = xc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = float(cam.fx) * xc[:, 0] / z + float(cam.cx)
            v = float(cam.fy) * xc[:, 1] / z + float(cam.cy)
        W, H = int(cam.width), int(cam.height)
        ok = (z > 0.1) & (np.linalg.norm(xc, axis=-1) < radius)
        if W > 0 and H > 0:
            ok &= (u >= -margin) & (u < W + margin) \
                & (v >= -margin) & (v < H + margin)
        cand = rows[ok]
        if len(cand) == 0:
            return lmap
        # nearest-first (stable working-set behavior under pressure)
        order = np.argsort(np.linalg.norm(xc[ok], axis=-1))
        cand = cand[order][:reload_max]

        K = reload_max
        pad = K - len(cand)
        xyz_b = np.concatenate([self.xyz[cand],
                                np.zeros((pad, 3), np.float32)])
        desc_b = np.concatenate([self.desc[cand],
                                 np.zeros((pad,) + self.desc.shape[1:],
                                          self.desc.dtype)])
        col_b = np.concatenate([self.color[cand],
                                np.zeros(pad, np.float32)])
        valid_b = np.concatenate([np.ones(len(cand), bool),
                                  np.zeros(pad, bool)])
        new_lmap, slot, placed = reload_into_map(
            lmap, jnp.asarray(xyz_b), jnp.asarray(desc_b),
            jnp.asarray(valid_b), jnp.asarray(int(frame_idx), jnp.int32),
            color=jnp.asarray(col_b))
        placed_np = np.asarray(placed)
        slot_np = np.asarray(slot)
        gen = np.asarray(new_lmap.generation)
        for i, row in enumerate(cand):
            if placed_np[i]:
                key = (int(slot_np[i]), int(gen[slot_np[i]]))
                self.dormant[row] = False
                self._key_to_row[key] = int(row)
                self._row_key[int(row)] = key
                self.n_reloads += 1
                self.reload_keys.add(key)
        return new_lmap
