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


@functools.partial(jax.jit, static_argnames=())
def _pack_live(lmap):
    """Flatten the live table to ONE (M, 6+D) **uint32** matrix for a single
    device→host transfer (each separate array fetch over the axon tunnel
    pays a full ~30 ms round trip; measured r4: the 5-fetch sync cost 267 ms
    per keyframe, and r5: a second blocking consumption point cost ~15 ms).

    The carrier dtype is uint32, NOT f32: arbitrary 256-bit descriptor words
    routinely land on NaN bit patterns, and any NaN canonicalization in a
    float transfer would silently corrupt archived descriptors used for
    reload matching (r4 advisor finding). Integer arrays are never
    canonicalized, and bitcasting the f32 metadata INTO uint32 for the ride
    is lossless — the host views those columns back as f32."""
    u32 = jnp.uint32
    f32 = jnp.float32
    meta = jnp.concatenate([
        lmap.valid.astype(f32)[:, None],
        lmap.generation.astype(f32)[:, None],
        lmap.xyz.astype(f32),
        lmap.color.astype(f32)[:, None],
    ], axis=1)
    desc = lmap.desc
    if desc.dtype != u32:
        desc = jax.lax.bitcast_convert_type(desc.astype(f32), u32)
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(meta, u32),
         desc.reshape(desc.shape[0], -1)], axis=1)


class LandmarkArchive:
    """Growable host-side landmark store (numpy). Not a pytree — owned by
    the host `SlamSystem` next to the keyframe DB.

    Bookkeeping is VECTORIZED: `_slot_row`/`_slot_gen` arrays mirror the
    live table's occupancy so a sync touches only the handful of slots that
    actually changed since the last keyframe (the per-slot python dict walk
    of the first implementation cost ~100 ms/keyframe at 8192 slots)."""

    def __init__(self, desc_shape=(8,), desc_dtype=np.uint32):
        self.xyz = np.zeros((0, 3), np.float32)
        self.color = np.zeros(0, np.float32)
        self.desc = np.zeros((0,) + tuple(desc_shape), desc_dtype)
        self.dormant = np.zeros(0, bool)       # True = not in the live map
        self._key_to_row = {}                  # (slot, generation) -> row
        self._row_key = []                     # row -> live key or None
        self._slot_row = None                  # (M,) archive row per slot, -1
        self._slot_gen = None                  # (M,) generation per slot, -1
        self.n_reloads = 0
        self.n_spills = 0
        self.reload_keys = set()               # (slot, gen) created by reload

    def __len__(self):
        return len(self.xyz)

    def _ensure_slot_maps(self, M: int):
        if self._slot_row is not None and len(self._slot_row) == M:
            return
        # (re)build from the key dict — e.g. after checkpoint restore
        self._slot_row = np.full(M, -1, np.int64)
        self._slot_gen = np.full(M, -1, np.int64)
        for (slot, gen), row in self._key_to_row.items():
            self._slot_row[slot] = row
            self._slot_gen[slot] = gen

    def _displace(self, rows):
        """Mark archive rows dormant (their slot got a new occupant)."""
        rows = rows[rows >= 0]
        if not len(rows):
            return
        newly = ~self.dormant[rows]
        self.dormant[rows] = True
        self.n_spills += int(newly.sum())
        for r in rows:
            k = self._row_key[r]
            if k is not None:
                self._key_to_row.pop(k, None)
                self._row_key[int(r)] = None

    def sync(self, lmap) -> None:
        """Upsert the live map into the archive; mark recycled rows dormant.

        Call per keyframe with the current (device) LandmarkMap. ONE
        device→host transfer; host work is O(changed slots)."""
        self.sync_packed(np.asarray(_pack_live(lmap)))

    def sync_packed(self, arr: np.ndarray) -> None:
        """`sync` from an already-fetched `_pack_live` uint32 matrix — lets
        the caller start the bulk D2H copy asynchronously and overlap it
        with other keyframe work (pipeline/system._keyframe_backend)."""
        M = arr.shape[0]
        meta = np.ascontiguousarray(arr[:, :6]).view(np.float32)
        valid = meta[:, 0] > 0.5
        gen = meta[:, 1].astype(np.int64)
        xyz = meta[:, 2:5]
        col = meta[:, 5]
        draw = np.ascontiguousarray(arr[:, 6:])
        if self.desc.dtype != np.uint32:
            draw = draw.view(np.float32).astype(self.desc.dtype)
        desc = draw.reshape((M,) + self.desc.shape[1:])

        self._ensure_slot_maps(M)
        changed = valid & (gen != self._slot_gen)
        vanished = (~valid) & (self._slot_row >= 0)
        self._displace(self._slot_row[changed | vanished])
        self._slot_row[vanished] = -1
        self._slot_gen[vanished] = -1
        # unchanged live occupants: refresh positions (BA refinements flow in)
        keep = valid & ~changed & (self._slot_row >= 0)
        if keep.any():
            self.xyz[self._slot_row[keep]] = xyz[keep]
        # new occupants: append rows
        new_slots = np.nonzero(changed)[0]
        if len(new_slots):
            base = len(self.xyz)
            self.xyz = np.concatenate([self.xyz, xyz[new_slots]])
            self.desc = np.concatenate([self.desc, desc[new_slots]])
            self.color = np.concatenate([self.color, col[new_slots]])
            self.dormant = np.concatenate(
                [self.dormant, np.zeros(len(new_slots), bool)])
            for i, sl in enumerate(new_slots):
                key = (int(sl), int(gen[sl]))
                self._key_to_row[key] = base + i
                self._row_key.append(key)
            self._slot_row[new_slots] = base + np.arange(len(new_slots))
            self._slot_gen[new_slots] = gen[new_slots]

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
        # ONE packed fetch for the insert outcome (slot, placed, new gen)
        aux = np.asarray(jnp.concatenate([
            slot.astype(jnp.float32), placed.astype(jnp.float32),
            new_lmap.generation[jnp.clip(slot, 0, None)].astype(jnp.float32),
        ]))
        slot_np = aux[:K].astype(np.int64)
        placed_np = aux[K:2 * K] > 0.5
        gen_np = aux[2 * K:].astype(np.int64)
        self._ensure_slot_maps(int(new_lmap.valid.shape[0]))
        for i, row in enumerate(cand):
            if placed_np[i]:
                sl = int(slot_np[i])
                # the evicted previous occupant of this slot goes dormant NOW
                # (the slot maps are updated here, so the next sync won't see
                # the change)
                prev = self._slot_row[sl]
                if prev >= 0 and prev != row:
                    self._displace(np.asarray([prev]))
                key = (sl, int(gen_np[i]))
                self.dormant[row] = False
                self._key_to_row[key] = int(row)
                self._row_key[int(row)] = key
                self._slot_row[sl] = int(row)
                self._slot_gen[sl] = int(gen_np[i])
                self.n_reloads += 1
                self.reload_keys.add(key)
        return new_lmap
