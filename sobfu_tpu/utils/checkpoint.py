"""Checkpoint / resume for a reconstruction run.

The reference has NO checkpointing — state (phi_global, psi) lives only in
GPU memory for the run (SURVEY.md §5). Here the full pipeline state
serialises to a single .npz so a stream can resume mid-sequence.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def state_dict(fusion) -> dict:
    """Pipeline state as a flat dict of numpy arrays (orbax/npz-agnostic).

    Captures the COMPLETE cross-frame state: all four TSDF volumes
    (phi_global, phi_global_psi_inv, phi_n, phi_n_psi — the reference keeps
    the same four on-device, sob_fusion.hpp:60-68), both deformation fields,
    and the inv-warp staleness flag. The solver's momentum velocity is
    per-solve (zero-initialised inside estimate_psi every frame), so it is
    not cross-frame state and needs no persistence; likewise the stall
    detector resets each solve.
    """
    state = {
        "frame_counter": np.asarray(fusion.frame_counter),
        "poses": np.stack(fusion.poses, axis=0),
    }
    if fusion.phi_global is not None:
        state["phi_global_tsdf"] = np.asarray(fusion.phi_global.tsdf)
        state["phi_global_weight"] = np.asarray(fusion.phi_global.weight)
        state["psi"] = np.asarray(fusion.psi.data)
        state["psi_inv"] = np.asarray(fusion.psi_inv.data)
        for name in ("phi_global_psi_inv", "phi_n", "phi_n_psi"):
            vol = getattr(fusion, name)
            state[f"{name}_tsdf"] = np.asarray(vol.tsdf)
            state[f"{name}_weight"] = np.asarray(vol.weight)
        state["inv_warps_stale"] = np.asarray(
            bool(getattr(fusion, "_inv_warps_stale", False))
        )
        state["n_psi_weight_stale"] = np.asarray(
            bool(getattr(fusion, "_n_psi_weight_stale", False))
        )
    return state


def save_checkpoint_orbax(path: str, fusion) -> None:
    """Orbax-backed checkpoint (production path: async-safe, versioned).

    Falls back to :func:`save_checkpoint` when orbax is unavailable.
    """
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return save_checkpoint(path, fusion)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state_dict(fusion), force=True)


def load_checkpoint_orbax(path: str, fusion) -> None:
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return load_checkpoint(path, fusion)
    ckptr = ocp.PyTreeCheckpointer()
    data = ckptr.restore(os.path.abspath(path))
    _restore(data, fusion)


def save_checkpoint(path: str, fusion) -> None:
    """Serialise a SobFusion pipeline's device state to `path` (.npz)."""
    # np.savez appends ".npz" unless the name already ends with it
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **state_dict(fusion))
    os.replace(tmp, path)


def load_checkpoint(path: str, fusion) -> None:
    """Restore a SobFusion pipeline's state in place from `path`."""
    _restore(np.load(path), fusion)


def _restore(data, fusion) -> None:
    from sobfu_tpu.fields import DeformationField
    from sobfu_tpu.tsdf import TsdfVolume
    from sobfu_tpu import solver as solver_mod

    fusion.frame_counter = int(data["frame_counter"])
    fusion.poses = [p for p in np.asarray(data["poses"])]
    if "phi_global_tsdf" in data:
        p = fusion.params
        fusion.phi_global = TsdfVolume(p)
        fusion.phi_global.tsdf = jnp.asarray(data["phi_global_tsdf"])
        fusion.phi_global.weight = jnp.asarray(data["phi_global_weight"])
        fusion.phi_global_psi_inv = TsdfVolume(p)
        fusion.phi_n = TsdfVolume(p)
        fusion.phi_n_psi = TsdfVolume(p)
        # auxiliary volumes (absent in pre-round-4 checkpoints: those left
        # them empty until the next solve refilled them)
        for name in ("phi_global_psi_inv", "phi_n", "phi_n_psi"):
            if f"{name}_tsdf" in data:
                vol = getattr(fusion, name)
                vol.tsdf = jnp.asarray(data[f"{name}_tsdf"])
                vol.weight = jnp.asarray(data[f"{name}_weight"])
        fusion._inv_warps_stale = bool(
            np.asarray(data["inv_warps_stale"])
        ) if "inv_warps_stale" in data else False
        fusion._n_psi_weight_stale = bool(
            np.asarray(data["n_psi_weight_stale"])
        ) if "n_psi_weight_stale" in data else False
        fusion.psi = DeformationField(p.volume_dims, jnp.asarray(data["psi"]))
        fusion.psi_inv = DeformationField(p.volume_dims, jnp.asarray(data["psi_inv"]))
        fusion.solver = solver_mod.Solver(p)
