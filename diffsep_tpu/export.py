"""Self-contained serving artifacts via jax.export (StableHLO).

Deployment story the reference does not have: its separate.py re-builds the
Python model from hydra config + checkpoint on every host
(/root/reference/separate.py:49-75), so serving requires the full training
codebase. Here the WHOLE separation program — normalization, the N-step
reverse diffusion `lax.scan`, denormalization, with the weights baked in as
constants — is exported once to a multi-platform (cpu, tpu) StableHLO
module and shipped as one file. The loader needs diffsep_tpu for exactly
nothing but this module: `load_separator(path).call(seed, mix)`.

Format (single file, little-endian):
    8 bytes   magic  b"DSEXP01\\n"
    4 bytes   uint32 JSON metadata length
    ...       JSON metadata (shapes, sampler config, versions)
    ...       jax.export serialized blob

The artifact has STATIC shapes (batch, n_samples) — the serving contract;
pad or chunk on the caller side (cli/serve.py and streaming.py show both
patterns). Shorter requests are first-class: the program takes a per-row
`n_valid` length and computes normalization statistics over each row's
true span only (spec_version 2), so zero-padding does not distort the
network input. Multiple operating points = multiple artifacts.
"""
from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"DSEXP01\n"

__all__ = ["export_separator", "load_separator", "ExportedSeparator"]


def export_separator(
    model,
    params,
    batch: int,
    n_samples: int,
    out_path: Optional[str | Path] = None,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
    **sampler_kwargs,
) -> bytes:
    """Export `model.separate` with `params` baked in.

    The exported callable is `(seed: int32 scalar, mix: f32[batch, 1,
    n_samples], n_valid: i32[batch]) -> est: f32[batch, n_speakers,
    n_samples]`; the seed feeds `jax.random.PRNGKey` inside the program, so
    the artifact is fully deterministic per (seed, mix, n_valid). n_valid
    makes the STATIC shape serve variable-length requests: rows are
    zero-padded to n_samples and normalization statistics come from each
    row's true span only (model.separate_masked — padding before an
    unmasked normalize would distort the stats, and normalization's affine
    invariance means no caller-side pre-scaling can compensate). Passing
    n_valid == n_samples reproduces model.separate.

    sampler_kwargs override the model's config-derived sampler defaults
    (predictor_name, corrector_name, N, snr, corrector_steps, denoise,
    schedule) — same keys as `model.separate`.
    """
    from jax import export as jax_export

    def fn(seed, mix, n_valid):
        est, _ = model.separate_masked(
            params, jax.random.PRNGKey(seed), mix, n_valid, **sampler_kwargs
        )
        return est

    exp = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((batch, 1, n_samples), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
    )
    blob = exp.serialize()

    kw = dict(model.sampler_kwargs)
    kw.update(sampler_kwargs)
    meta = {
        "spec_version": 2,
        "batch": int(batch),
        "n_samples": int(n_samples),
        "n_speakers": int(model.config.model.n_speakers),
        "fs": int(model.config.model.fs),
        "sampler": {k: v for k, v in kw.items() if _json_ok(v)},
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
        "param_bytes": int(
            sum(x.nbytes for x in jax.tree_util.tree_leaves(params))
        ),
    }
    mj = json.dumps(meta).encode()
    data = _MAGIC + struct.pack("<I", len(mj)) + mj + blob
    if out_path is not None:
        Path(out_path).write_bytes(data)
    return data


def _json_ok(v):
    try:
        json.dumps(v)
        return True
    except TypeError:
        return False


class ExportedSeparator:
    """A deserialized separation artifact: `call(seed, mix)` runs the full
    reverse process on the current default device; `meta` carries the
    static contract (batch, n_samples, fs, sampler config)."""

    def __init__(self, meta: dict, exported):
        self.meta = meta
        self._exported = exported

    @property
    def batch(self) -> int:
        return self.meta["batch"]

    @property
    def n_samples(self) -> int:
        return self.meta["n_samples"]

    def call(self, seed: int, mix, n_valid=None) -> jax.Array:
        """Run the baked reverse process. `n_valid` (int per row, default
        n_samples everywhere) marks each row's true length within the
        static shape: rows zero-padded on the caller side get
        normalization stats from the true span only and a zeroed pad
        region in the estimate (spec_version 2 artifacts)."""
        mix = jnp.asarray(mix, jnp.float32)
        want = (self.batch, 1, self.n_samples)
        if tuple(mix.shape) != want:
            raise ValueError(
                f"exported artifact takes mix of shape {want} "
                f"(static serving contract), got {tuple(mix.shape)}; "
                "pad/chunk the batch and length on the caller side"
            )
        if n_valid is None:
            n_valid = np.full((self.batch,), self.n_samples)
        n_valid = jnp.asarray(n_valid, jnp.int32)
        if tuple(n_valid.shape) != (self.batch,):
            raise ValueError(
                f"n_valid must have shape ({self.batch},), got "
                f"{tuple(n_valid.shape)}"
            )
        if self.meta["spec_version"] < 2:
            # v1 artifacts take (seed, mix) and normalize over the full
            # static length; only full-length calls are faithful
            if int(jnp.min(n_valid)) < self.n_samples:
                raise ValueError(
                    "this artifact predates variable-length support "
                    "(spec_version 1); re-export it to serve padded rows"
                )
            return self._exported.call(jnp.int32(seed), mix)
        return self._exported.call(jnp.int32(seed), mix, n_valid)


def load_separator(path_or_bytes) -> ExportedSeparator:
    """Load an artifact written by `export_separator`. Accepts a path or
    the raw bytes."""
    from jax import export as jax_export

    data = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else Path(path_or_bytes).read_bytes()
    )
    if data[: len(_MAGIC)] != _MAGIC:
        raise ValueError(
            "not a diffsep export artifact (bad magic); expected a file "
            "written by export_separator / cli.export_model"
        )
    off = len(_MAGIC)
    (mlen,) = struct.unpack_from("<I", data, off)
    off += 4
    meta = json.loads(data[off : off + mlen].decode())
    if meta.get("spec_version") not in (1, 2):
        raise ValueError(f"unsupported artifact spec_version {meta.get('spec_version')}")
    exported = jax_export.deserialize(bytearray(data[off + mlen :]))
    return ExportedSeparator(meta, exported)
