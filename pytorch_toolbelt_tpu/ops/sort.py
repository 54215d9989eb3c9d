"""Pallas TPU kernel: chunked bitonic sort for long rows.

The full O(N log^2 N) bitonic network restructured at chunk granularity
(chunk = 2^c elements, VMEM-resident):

* phase 1 — Pallas sweeps sort every chunk locally (stages 1..c of the
  network, ~c^2/2 unrolled compare-exchange passes, all in VMEM; chunks
  larger than 2^14 are built hierarchically to bound Mosaic compile time),
  chunk direction alternating asc/desc as the global network requires;
* stages c+1..log2(N) — the passes with span >= chunk are plain elementwise
  min/max/select between chunk pairs at the XLA level; the within-chunk
  tail of each stage (span < chunk: a bitonic *merge*, log2(C) passes) is
  another Pallas sweep in VMEM.

The output is the standard bitonic sorting network's output — i.e. exactly
``lax.sort`` semantics for distinct keys (bitonic networks, like XLA's
default sort, are unstable under ties).

Performance (v5e, [19, 2^23] f32 keys + i32 payload): 793 ms steady vs
750 ms for ``lax.sort`` — the two land on the same VMEM-bandwidth wall
(~44G compare-exchanges x ~24 B of VMEM traffic each ~ 1 TB/sort), which
establishes that XLA's sort is NOT HBM-streaming-bound and that the
comparison-sort floor on this hardware is ~0.75 s for this shape (analysis
in benchmarks/RESULTS.md "Lovasz and the sorting roofline").  The kernel is
therefore an opt-in (`losses.lovasz.USE_CHUNKED_SORT`) rather than the
default — it is the proof artifact for the roofline claim and headroom for
parts with a higher VMEM:HBM bandwidth ratio.

Reference counterpart: torch.sort inside pytorch_toolbelt/losses/
lovasz.py:70,150 (cub radix sort on CUDA — radix's scatter phase needs
element-granularity dynamic writes the TPU DMA model does not offer).
"""

from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

__all__ = ["bitonic_sort_chunked", "chunked_sort_supported", "split_sort", "split_sort_supported"]


def _log2(x: int) -> int:
    return x.bit_length() - 1


def chunked_sort_supported(n: int, chunk_size: int = 1 << 17) -> bool:
    """Rows qualify when power-of-two length with at least two lane-aligned
    chunks (the kernel views each chunk as [C/128, 128])."""
    return (
        _PALLAS_OK
        and chunk_size >= 2 * _LANE
        and chunk_size % _LANE == 0
        and n >= 2 * chunk_size
        and (n & (n - 1)) == 0
        and n % chunk_size == 0
    )


_LANE = 128


def _flat_hi_bit(R: int, L: int, bit: int):
    """``(j >> bit) & 1`` (int32 0/1) over the flat in-chunk index
    j = r*L + lane, materialized along whichever of the two axes carries
    that bit.  Mosaic cannot shape-cast across the lane axis and dislikes
    broadcast i1 vectors, so int masks — not reshapes or bools — carry the
    bitonic network's pairing and direction structure."""
    lane_bits = _log2(L)
    if bit >= lane_bits:
        io = jax.lax.broadcasted_iota(jnp.int32, (1, R, 1), 1)
        return (io >> (bit - lane_bits)) & 1
    io = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
    return (io >> bit) & 1


def _bitsel(a, b, take_mask):
    """``take ? a : b`` elementwise via full-word bitwise blend (take_mask is
    int32 0/-1); exact for any 32-bit dtype, no i1 vectors involved."""
    dtype = a.dtype
    if dtype != jnp.int32:
        a = jax.lax.bitcast_convert_type(a, jnp.int32)
        b = jax.lax.bitcast_convert_type(b, jnp.int32)
    out = (a & take_mask) | (b & ~take_mask)
    if dtype != jnp.int32:
        out = jax.lax.bitcast_convert_type(out, dtype)
    return out


def _cx_roll(keys, payl, d: int, hi_flag):
    """One compare-exchange pass at flat distance ``d`` over [G, C/128, 128]
    chunk data, as an XOR-shuffle: partner(j) = j ^ d is j+d where bit
    log2(d) of j is clear and j-d where set, so two circular rolls + a
    bitwise blend fetch every partner without any reshape.

    ``hi_flag`` (int32 0/1, broadcastable) is bit ``stage`` of the flat
    global index — 1 means this position's pair sorts DESCENDING.
    """
    G, R, L = keys.shape
    axis, s = (1, d // L) if d >= L else (2, d)
    ext = keys.shape[axis]
    # pltpu.roll wants non-negative shifts; roll by ext-s == roll by -s
    kp, km = pltpu.roll(keys, ext - s, axis), pltpu.roll(keys, s, axis)
    pp_, pm = pltpu.roll(payl, ext - s, axis), pltpu.roll(payl, s, axis)
    is_hi = _flat_hi_bit(R, L, _log2(d))  # 0 -> partner at +d, 1 -> at -d
    pair_lo = -(1 - is_hi)  # 0/-1 blend masks
    partner_k = _bitsel(kp, km, pair_lo)
    partner_p = _bitsel(pp_, pm, pair_lo)
    # take the partner iff it improves this position's order:
    #   ascending pair:  lo wants the smaller key, hi wants the larger
    #   descending pair: roles flip
    # -> want_gt = is_hi XOR hi_flag ; take = want_gt ? (partner>keys) : (<)
    lt = (partner_k < keys).astype(jnp.int32)
    gt = (partner_k > keys).astype(jnp.int32)
    want_gt = is_hi ^ hi_flag
    take = -(lt + want_gt * (gt - lt))  # 0/-1
    return _bitsel(partner_k, keys, take), _bitsel(partner_p, payl, take)


def _chunk_hi_flags(pid, G: int, S: int, bit: int):
    """Per-chunk int32 0/1 [G, 1, 1]: bit ``bit`` of the global chunk index
    (1 == this chunk sorts descending at the current stage)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (G, 1, 1), 0)
    gc = (pid * G + iota) % S
    return (gc >> bit) & 1


def _range_sort_kernel(kin, pin, kout, pout, *, G, C, S, start_stage):
    """Stages ``start_stage``..log2(C) of the bitonic network within each
    C-sized chunk.  start_stage=1 is a full local sort; start_stage=m+1
    merges already-sorted 2^m runs into sorted chunks.  Directions are the
    global network's: bit k of the flat global index — carried by the
    in-chunk index for k < log2(C) and by chunk parity at the final stage
    (even chunks ascend, odd descend, as the next level expects)."""
    c = _log2(C)
    R, L = C // _LANE, _LANE
    keys = kin[...]
    payl = pin[...]
    parity = _chunk_hi_flags(pl.program_id(0), G, S, 0)
    for k in range(start_stage, c + 1):
        hi_stage = parity if k == c else _flat_hi_bit(R, L, k)
        for j in range(k - 1, -1, -1):
            keys, payl = _cx_roll(keys, payl, 1 << j, hi_stage)
    kout[...] = keys
    pout[...] = payl


def _merge_sweep_kernel(kin, pin, kout, pout, *, G, C, S, bit):
    """Within-chunk tail of global stage c+bit: bitonic merge (distances
    C/2..1) with per-chunk direction from bit ``bit`` of the chunk index."""
    keys = kin[...]
    payl = pin[...]
    hi = _chunk_hi_flags(pl.program_id(0), G, S, bit)
    for j in range(_log2(C) - 1, -1, -1):
        keys, payl = _cx_roll(keys, payl, 1 << j, hi)
    kout[...] = keys
    pout[...] = payl


def _pallas_sweep(kernel, kk, pp, G, interpret):
    # Mosaic requires the last two block dims divisible by (8, 128), so the
    # [rows, C] chunk matrix is presented as [rows, C/128, 128] blocks.
    rows, C = kk.shape
    kk3 = kk.reshape(rows, C // _LANE, _LANE)
    pp3 = pp.reshape(rows, C // _LANE, _LANE)
    grid = (rows // G,)
    spec = pl.BlockSpec((G, C // _LANE, _LANE), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        # long unrolled compare-exchange chains need more scoped VMEM than
        # the 16M default (v5e has 128M physical)
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    ko, po = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(kk3.shape, kk.dtype),
            jax.ShapeDtypeStruct(pp3.shape, pp.dtype),
        ),
        interpret=interpret,
        **kwargs,
    )(kk3, pp3)
    return ko.reshape(rows, C), po.reshape(rows, C)


def _cross_pass(keys, payl, D, bit):
    """Chunk-granularity compare-exchange: chunk a vs a^D, elementwise over
    the chunk, direction from bit ``bit`` of the chunk index.  [R, S, C]."""
    R, S, C = keys.shape
    ks = keys.reshape(R, S // (2 * D), 2, D * C)
    ps = payl.reshape(R, S // (2 * D), 2, D * C)
    klo, khi = ks[:, :, 0], ks[:, :, 1]
    plo, phi = ps[:, :, 0], ps[:, :, 1]
    groups = S // (2 * D)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, groups, 1), 1)
    asc = ((iota >> (bit - _log2(2 * D))) & 1) == 0
    swap = jnp.where(asc, klo > khi, klo < khi)
    nk = jnp.stack([jnp.where(swap, khi, klo), jnp.where(swap, klo, khi)], axis=2)
    np_ = jnp.stack([jnp.where(swap, phi, plo), jnp.where(swap, plo, phi)], axis=2)
    return nk.reshape(R, S, C), np_.reshape(R, S, C)


# Mosaic compile time grows superlinearly with the number of unrolled
# compare-exchange passes; ~105 passes (a 2^14 full sort, ~15 s) is fine
# while ~136 (2^16) times out.  Larger chunks are therefore built
# hierarchically: full sort at _BASE, then one range-merge kernel per level.
_BASE = 1 << 14


@partial(jax.jit, static_argnames=("chunk_size", "block_chunks", "interpret"))
def bitonic_sort_chunked(keys, payload, chunk_size: int = 1 << 17, block_chunks: int = 2, interpret: bool = False):
    """Sort rows of ``keys`` ascending (carrying ``payload``) via the
    VMEM-chunked bitonic network.  [R, N] -> ([R, N], [R, N]).

    Falls back to ``jax.lax.sort`` when the geometry does not qualify
    (N not a power of two, or fewer than two chunks).
    """
    R, N = keys.shape
    C = chunk_size
    # the bitwise blends in _cx_roll reinterpret operands as int32
    four_byte = keys.dtype.itemsize == 4 and payload.dtype.itemsize == 4
    if not (four_byte and chunked_sort_supported(N, C)):
        return jax.lax.sort((keys, payload), dimension=-1, num_keys=1)
    S = N // C

    # phase 1: sort each C-chunk in VMEM, hierarchically when C > _BASE
    kk = keys.reshape(-1, min(C, _BASE))
    pp = payload.reshape(-1, min(C, _BASE))
    level_c = min(C, _BASE)
    start = 1
    while True:
        rows = (R * N) // level_c
        G = block_chunks
        while rows % G:
            G //= 2
        kk, pp = _pallas_sweep(
            partial(_range_sort_kernel, G=G, C=level_c, S=N // level_c, start_stage=start),
            kk, pp, G, interpret,
        )
        if level_c == C:
            break
        start = _log2(level_c) + 1
        level_c = min(C, level_c << 3)  # up to 3 more stages per kernel
        kk = kk.reshape(-1, level_c)
        pp = pp.reshape(-1, level_c)

    # phase 2: global stages c+1..log2(N): cross-chunk passes in XLA + the
    # within-chunk merge tail in VMEM
    return _global_merge(kk.reshape(R, S, C), pp.reshape(R, S, C), block_chunks, interpret)


def _global_merge(kk, pp, block_chunks: int, interpret: bool, start_bit: int = 1):
    """Global stages c+start_bit..log2(N) of the bitonic network over
    [R, S, C] chunked rows: cross-chunk compare-exchanges in XLA + the
    within-chunk merge tail (distances C/2..1) as one Pallas VMEM sweep per
    stage.

    Input invariant for ``start_bit = m``: each run of 2^(m-1) consecutive
    chunks is sorted as one sequence, ascending when bit m-1 of the chunk
    index is 0, descending otherwise — i.e. the state the network is in
    after completing stage c+m-1.  ``start_bit=1`` is the classic
    alternating-chunk input phase 1 leaves behind.  Returns the fully
    sorted [R, N] pair.
    """
    R, S, C = kk.shape
    G = block_chunks
    while (R * S) % G:
        G //= 2
    for bit in range(start_bit, _log2(S) + 1):  # global stage k = c + bit
        for Dj in range(bit - 1, -1, -1):
            kk, pp = _cross_pass(kk, pp, 1 << Dj, bit)
        kk2, pp2 = _pallas_sweep(
            partial(_merge_sweep_kernel, G=G, C=C, S=S, bit=bit),
            kk.reshape(R * S, C),
            pp.reshape(R * S, C),
            G,
            interpret,
        )
        kk, pp = kk2.reshape(R, S, C), pp2.reshape(R, S, C)
    return kk.reshape(R, S * C), pp.reshape(R, S * C)


def split_sort_supported(n: int, chunk_size: int = 1 << 20) -> bool:
    """Same geometry rules as the chunked bitonic sort (power-of-two rows,
    >=2 lane-aligned chunks, Pallas importable)."""
    return chunked_sort_supported(n, chunk_size)


@partial(jax.jit, static_argnames=("chunk_size", "merge_chunk", "block_chunks", "interpret"))
def split_sort(
    keys,
    payload,
    chunk_size: int = 1 << 20,
    merge_chunk: int = 1 << 17,
    block_chunks: int = 1,
    interpret: bool = False,
):
    """Hybrid long-row sort: ``lax.sort`` per VMEM-sized chunk, bitonic
    cross-chunk merge.  [R, N] -> ([R, N], [R, N]), ascending.

    Rationale (measured on v5e, benchmarks/RESULTS.md "Round-3 Lovasz
    levers"): a [*, 2^23] ``lax.sort`` row streams HBM on every one of its
    276 bitonic passes (~750 ms at the Lovasz bench shape), while 2^20 rows
    sort ~1.9x faster per element.  This kernel buys that speed for long
    rows WITHOUT changing semantics: phase 1 sorts each of the
    S = N/chunk_size chunks independently with ``lax.sort`` (direction
    alternated by reversing odd chunks — one elementwise pass), phase 2
    runs only the remaining log2(S) global bitonic merge stages.

    The two granularities are deliberately decoupled: ``chunk_size`` is the
    phase-1 ``lax.sort`` row length (bigger = fewer merge stages), while
    ``merge_chunk`` bounds the Pallas merge-tail working set (a 2^20-chunk
    sweep spills ~120 MB of registers and exceeds v5e's 128 MB VMEM; 2^17
    is the proven sweet spot from ``bitonic_sort_chunked``).  Phase 2
    therefore views the row at ``merge_chunk`` granularity and enters
    ``_global_merge`` at ``start_bit = log2(chunk_size/merge_chunk) + 1``
    — the stage the phase-1 sort has already completed through.

    Output is exactly ``lax.sort``'s for distinct keys; like ``lax.sort``
    (and any bitonic network) the payload order under duplicate keys is
    unspecified.  Falls back to ``lax.sort`` when the geometry does not
    qualify (``split_sort_supported``) or dtypes are not 4-byte.
    """
    R, N = keys.shape
    C = chunk_size
    four_byte = keys.dtype.itemsize == 4 and payload.dtype.itemsize == 4
    if not (four_byte and split_sort_supported(N, C)):
        return jax.lax.sort((keys, payload), dimension=-1, num_keys=1)
    S = N // C

    kk, pp = jax.lax.sort(
        (keys.reshape(R * S, C), payload.reshape(R * S, C)), dimension=-1, num_keys=1
    )
    kk = kk.reshape(R, S // 2, 2, C)
    pp = pp.reshape(R, S // 2, 2, C)
    # odd chunks descend, as the first merge stage of the network expects
    kk = jnp.concatenate([kk[:, :, :1], jnp.flip(kk[:, :, 1:], axis=-1)], axis=2)
    pp = jnp.concatenate([pp[:, :, :1], jnp.flip(pp[:, :, 1:], axis=-1)], axis=2)
    # reshaping a C-run into Cm-chunks preserves the invariant _global_merge
    # needs at start_bit: an ascending (descending) C-run is exactly C/Cm
    # consecutive ascending (descending) Cm-chunks forming one sorted run
    Cm = min(merge_chunk, C)
    Sm = N // Cm
    start_bit = _log2(C // Cm) + 1
    return _global_merge(
        kk.reshape(R, Sm, Cm), pp.reshape(R, Sm, Cm), block_chunks, interpret, start_bit
    )
