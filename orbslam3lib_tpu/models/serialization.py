"""Map/Atlas checkpointing.

The reference disables atlas load ("Loading Atlas from file is not supported
in this version", System.cc:146-150) though the PreSave/PostLoad scaffolding
exists (Atlas.h:102-104, Map.h:104-105). Here the map is pure tensors so
checkpoint/resume is a plain npz round trip (SURVEY.md §5.4)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .atlas import Atlas
from .map_state import MapState


def save_map(m: MapState, path: str):
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in m._asdict().items()})


def _field_or_default(z, key, field, like):
    """Backwards-compatible load: fields added after a save default to the
    empty-map value (e.g. per-KF inertial state on pre-inertial maps)."""
    if key in z:
        return jnp.asarray(z[key])
    return getattr(like, field)


def load_map(path: str) -> MapState:
    z = np.load(path)
    K, F = z["kf_mp"].shape
    P = z["mp_pos"].shape[0]
    from .map_state import empty_map
    like = empty_map(K, P, F)
    return MapState(**{k: _field_or_default(z, k, k, like)
                       for k in MapState._fields})


def save_atlas(atlas: Atlas, path: str):
    arrays = {}
    for i, m in enumerate(atlas.maps):
        for k, v in m._asdict().items():
            arrays[f"map{i}_{k}"] = np.asarray(v)
    arrays["_n_maps"] = np.asarray(len(atlas.maps))
    arrays["_current"] = np.asarray(atlas.current)
    arrays["_dims"] = np.asarray(atlas._dims)
    np.savez_compressed(path, **arrays)


def load_atlas(path: str) -> Atlas:
    z = np.load(path)
    n = int(z["_n_maps"])
    dims = tuple(int(x) for x in z["_dims"])
    atlas = Atlas(*dims)
    from .map_state import empty_map
    like = empty_map(*dims)
    atlas.maps = []
    for i in range(n):
        atlas.maps.append(MapState(
            **{k: _field_or_default(z, f"map{i}_{k}", k, like)
               for k in MapState._fields}))
    atlas.bad = [False] * n
    atlas.current = int(z["_current"])
    return atlas
