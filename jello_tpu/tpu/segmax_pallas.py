"""Pallas segmented-max landing: scatter_max over block-monotone ids.

Replaces the path-bbox scatter_max in flatten (pipeline/flatten.py:
`bb_acc = scatter_max(bb_acc, pidx, upd)`): a top-level XLA scatter
costs ~10 ns per INPUT row on this fabric (8.5 ms at the 1.07M-row
line soup, round-5 trace), while the ids are monotone within each
512-aligned family block of the soup — so per 512-row sub-chunk each
id forms ONE contiguous run, a log-step segmented max-scan reduces
every run to its end row, and the (at most one per id) end-row values
land into a full-VMEM accumulator with one-hot MXU contractions. No
output windows, no flush discipline: the [K, P/128, 128] accumulator
(256 KB at P=16384) lives in scratch and is written once at the end.

Contract (matches the scatter formulation bit-for-bit):
  - ids: [R] i32-valued f32; rows with id >= P are dropped;
    VALID rows' ids are nondecreasing within each 512-aligned block
    (invalid/sentinel rows may interleave freely).
  - vals: K [R] f32 columns; finite on valid rows.
  - init: the accumulator starts at `init` (e.g. -1e30), exactly like
    a scatter_max target initialised to `init`.
  - straddling runs max-merge across sub-chunks (order-independent).

Reference semantics: flatten.wgsl's atomic PathBbox min/max
accumulation (cpu/flatten.go:656-824).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8           # sub-chunks per grid step
SUB_ROWS = 512    # rows per sub-chunk (the monotone-run alignment unit)
CH = SUB * SUB_ROWS

_NEG = -3.0e38


def _kernel(K, P, Pp, n_super, init):
    PR = Pp // 128

    def kernel(blk, out_ref, acc):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            acc[...] = jnp.full((K, PR, 128), init, jnp.float32)

        for j in range(SUB):
            sub = blk[0, pl.ds(j * SUB_ROWS, SUB_ROWS), :]
            rid = sub[:, 0:1].astype(jnp.int32)        # (512, 1)
            valid = rid < P
            # Fill-forward of valid ids over sentinel rows: ids are
            # nondecreasing on valid rows within the block, so a
            # running max of (valid ? id : -1) IS the last valid id.
            eff = jnp.where(valid, rid, -1)
            vals = [jnp.where(valid, sub[:, 1 + k:2 + k], _NEG)
                    for k in range(K)]
            # Shifts as sublane rotate + iota mask on (512, 1) columns
            # (Mosaic lowers tpu.rotate for any sublane count; 1-D
            # rolls and offset concats do not legalize).
            pos_i = jax.lax.broadcasted_iota(
                jnp.int32, (SUB_ROWS, 1), 0)

            def shift_dn(x, n, fill):
                rolled = pltpu.roll(x, n, 0)
                return jnp.where(pos_i < n, jnp.full_like(x, fill), rolled)

            n = 1
            while n < SUB_ROWS:
                eff = jnp.maximum(eff, shift_dn(eff, n, -1))
                n *= 2
            # Segmented inclusive max-scan by eff: run ends hold the
            # full within-sub-chunk run max.
            n = 1
            while n < SUB_ROWS:
                same = shift_dn(eff, n, -2) == eff
                for k in range(K):
                    v_sh = shift_dn(vals[k], n, _NEG)
                    vals[k] = jnp.maximum(
                        vals[k], jnp.where(same, v_sh, _NEG))
                n *= 2
            eff_nx = jnp.where(pos_i >= SUB_ROWS - 1, -2,
                               pltpu.roll(eff, SUB_ROWS - 1, 0))
            land = ((eff_nx != eff) & (eff >= 0)).astype(jnp.float32)

            drow = eff // 128                          # (512, 1)
            dlane = jax.lax.rem(eff, 128)
            iw = jax.lax.broadcasted_iota(
                jnp.int32, (SUB_ROWS, PR), 1)
            eqrowT = (iw == drow).astype(jnp.float32)  # (512, PR)
            il = jax.lax.broadcasted_iota(
                jnp.int32, (SUB_ROWS, 128), 1)
            eqlane = (il == dlane).astype(jnp.float32)  # (512, 128)

            def contract(weights):                     # (512, 1) -> (PR, 128)
                return jax.lax.dot_general(
                    eqrowT * weights, eqlane,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            cnt = contract(land)
            hit = cnt > 0.5
            for k in range(K):
                landed = contract(land * vals[k])
                acc[k] = jnp.where(
                    hit, jnp.maximum(acc[k], landed), acc[k])

        @pl.when(c == n_super - 1)
        def _():
            out_ref[...] = acc[...]

    return kernel


def segmax_land(xp, ids, vals, P, init=-1e30, interpret=False):
    """scatter_max(full((P, K), init), ids, stack(vals)) for
    block-monotone ids (see module doc). Returns [P, K] f32."""
    K = len(vals)
    R = ids.shape[0]
    Rp = -(-R // CH) * CH
    Pp = max(-(-P // 128) * 128, 128)  # accumulator rows pad to lanes
    f32 = xp.float32
    cols = [ids.astype(f32)] + [v.astype(f32) for v in vals]
    table = xp.stack(cols, axis=1)
    if Rp != R:
        # Sentinel padding rows: dropped by the id >= P test.
        pad = xp.zeros((Rp - R, 1 + K), dtype=f32)
        pad = pad.at[:, 0].set(f32(P))
        table = xp.concatenate([table, pad])
    n_super = Rp // CH
    call = pl.pallas_call(
        _kernel(K, P, Pp, n_super, float(init)),
        grid=(n_super,),
        in_specs=[pl.BlockSpec((1, CH, 1 + K), lambda c: (c, 0, 0))],
        out_specs=pl.BlockSpec((K, Pp // 128, 128), lambda c: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, Pp // 128, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, Pp // 128, 128), jnp.float32)],
        interpret=interpret,
    )
    out = call(table.reshape(n_super, CH, 1 + K))
    return out.reshape(K, Pp).T[:P]
