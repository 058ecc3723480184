#!/usr/bin/env python
"""Benchmark: FLCT tiled encode+decode throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mpx/s", "vs_baseline": N}

value       = combined encode+decode throughput (2 * pixels / (t_enc+t_dec))
              of the tiled TPU pipeline on a batch of real corpus gray8
              images, warm steady-state, work timed to device completion.
vs_baseline = value / (same combined metric for the native C++ single-core
              FLCS codec on the same pixels) — the stand-in for the Rust
              reference's single-threaded speed (no Rust toolchain in this
              image; the C++ core is a faithful same-algorithm reimpl).

The metric string also carries: container-level and PIPELINED-stream
throughput (images in -> bytes -> images back, transfers included), plus
kernel- and container-level rows for rgb8 and gray16 512x512 batches
(VERDICT r4: all three corpus classes benched on chip).

Also self-checks correctness each run: every round-trip must be exact and
the FLCS jax encoder byte-identical to the native encoder on a corpus image.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SUITE = "/root/reference/image-suite"
TILE = 32  # 32px tiles quadruple the lane count vs 64px and measure ~2x
# faster on chip; ratio cost vs single-stream FLCS is measured per run and
# reported in the metric string (docs/DESIGN.md §4 has the corpus numbers)
MAX_IMAGES = 12


def _synth(shape, dtype, n, step):
    rng = np.random.default_rng(0)
    hi = np.iinfo(dtype).max
    return [
        np.clip(
            np.cumsum(np.cumsum(rng.integers(-step, step + 1, shape), 0), 1)
            + hi // 2,
            0, hi,
        ).astype(dtype)
        for _ in range(n)
    ]


def load_suite(sub, shape, dtype, limit):
    from felics_tpu.io.images import load_image

    images = []
    root = os.path.join(SUITE, sub)
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            if not name.endswith(".tiff"):
                continue
            img = load_image(os.path.join(root, name))
            if img.shape == shape and img.dtype == dtype:
                images.append(img)
            if len(images) >= limit:
                break
    if not images:  # corpus not mounted: synthetic fallback
        step = 6 if np.dtype(dtype).itemsize == 1 else 800
        images = _synth(shape, dtype, max(4, limit // 2), step)
    return images


def load_batch():
    return load_suite("grayscale/8bit", (512, 512), np.uint8, MAX_IMAGES)


def native_baseline(images):
    import subprocess

    subprocess.run(
        [sys.executable, os.path.join(REPO, "native", "build.py")], check=True
    )
    from felics_tpu.api import compress_image_bytes, decompress_image_bytes

    pixels = sum(im.size for im in images)
    # warm
    compress_image_bytes(images[0], backend="native")
    # best-of-5, per-phase minima: the SAME reduction the TPU side uses
    # (min over encode iterations + min over decode iterations), so the
    # vs_baseline ratio is not biased by an asymmetric reduction. Five
    # iterations because transient host load deflates the baseline (and so
    # inflates vs_baseline) — the min needs one quiet pass.
    best_enc = best_dec = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        blobs = [compress_image_bytes(im, backend="native") for im in images]
        t1 = time.perf_counter()
        outs = [decompress_image_bytes(b, backend="native") for b in blobs]
        t2 = time.perf_counter()
        for im, out in zip(images, outs):
            assert np.array_equal(im, out)
        best_enc = min(best_enc, t1 - t0)
        best_dec = min(best_dec, t2 - t1)
    return 2 * pixels / (best_enc + best_dec) / 1e6, blobs


def tpu_bench(images, color, pd):
    """Kernel-level slope-timed encode+decode for one (color, depth) class.
    Returns (mpxs, t_enc, t_dec, ratio, n_tiles, pixels)."""
    import jax
    import jax.numpy as jnp

    from felics_tpu.config import TileConfig, tiled_config_for_depth
    from felics_tpu.ops.kscan_tiled import num_buckets
    from felics_tpu.parallel import tiling
    from felics_tpu.ops import pallas_codec as pc
    from felics_tpu.utils.timing import _sync

    cfg = tiled_config_for_depth(pd)
    nb = num_buckets(cfg)
    th = tw = TILE
    mod = (1 << cfg.depth_bits) - 1  # variant arithmetic stays in range

    # One big tile batch across all images (amortizes dispatch + syncs).
    tile_batches = [
        tiling._prepare_tiles(im, color, th, tw)[0] for im in images
    ]
    tiles_np = np.concatenate(tile_batches)
    n_tiles, c, t = tiles_np.shape
    pixels = sum(im.size // (3 if im.ndim == 3 else 1) for im in images)

    # Batch-global k-prior seed — the production v2 container seeds every
    # tile's k-table from a per-image prior; the kernel bench uses one
    # prior for the whole batch (same kernel program and per-step cost,
    # and roll-invariant so decode inputs can be permuted per rep).
    k0 = tiling.compute_k0(tiles_np, th, tw, cfg, nb)
    prior_j = jnp.asarray(tiling.prior_from_k0(k0, cfg, c))  # (C, nb, K)

    # Container-level warm pass: full bytes round-trip through the fused
    # Pallas engine (also records the self-tuned stream-width hint).
    tc = TileConfig(tile_h=th, tile_w=tw)
    blob0 = tiling.compress_tiled_bytes(images[0], tc, engine="pallas")
    assert np.array_equal(
        tiling.decompress_tiled_bytes(blob0, engine="pallas"), images[0]
    ), "pallas container round-trip mismatch"
    W = pc.width_hint(cfg, t, c)

    meta = [jnp.asarray(m) for m in pc._meta_arrays(th, tw, c, cfg.depth_bits)]

    # Timing methodology: the tunnel RTT (~25 ms, jitter +-2 ms) dwarfs
    # single-kernel device time (~4 ms), and dispatches cannot pipeline
    # through the tunnel, so per-call subtract-the-RTT estimates are noise.
    # Instead each dispatch runs the kernel REP times back-to-back on REP
    # DISTINCT inputs inside ONE jitted program, at TWO rep counts; the
    # SLOPE  t = (wall[R2] - wall[R1]) / (R2 - R1)  cancels the RTT and
    # every other fixed per-dispatch cost exactly. Distinct inputs defeat
    # the tunnel's identical-execution cache — derived ON DEVICE from a
    # tiny per-call seed vector (uploading rep full input stacks measured
    # ~40 s of bench wall per run); min over outer iterations drops
    # stragglers.
    R1, R2 = 4, 16
    iters = 3
    base_ls = jnp.asarray(tiles_np.reshape(n_tiles, c * t))

    def variant(seed):
        v = tiles_np.copy()
        v[0, 0, 2] = (v[0, 0, 2] + seed) % mod
        return v.reshape(n_tiles, c * t)

    def make_rep_encode(rep):
        @jax.jit
        def rep_encode(base, seeds):  # (n_tiles, c*t), (rep,)
            outs = []
            for r in range(rep):
                tiles_r = base.at[0, 2].set((base[0, 2] + seeds[r]) % mod)
                outs.append(
                    pc._encode_tiles_pallas(
                        tiles_r, *meta, prior_j, th, tw, c, W, cfg, False
                    )
                )
            return outs[-1][0], jnp.stack([b for (_, b) in outs])

        return rep_encode

    def min_wall(fn, arglists, sync):
        r = fn(*arglists[0])
        _sync(sync(r))
        best = float("inf")
        for a in arglists[1:]:
            t0 = time.perf_counter()
            r = fn(*a)
            _sync(sync(r))
            best = min(best, time.perf_counter() - t0)
        return best, r

    enc_walls = {}
    seed = 0
    for rep in (R1, R2):
        args = []
        for _ in range(iters + 1):
            args.append(
                (base_ls,
                 jnp.arange(seed, seed + rep, dtype=jnp.int32))
            )
            seed += rep
        enc_walls[rep], (words, bits_all) = min_wall(
            make_rep_encode(rep), args, lambda r: r[1]
        )
    t_enc = max(1e-9, enc_walls[R2] - enc_walls[R1]) / (R2 - R1)
    bits = bits_all[-1]

    bits_np = np.asarray(bits).astype(np.int64)
    assert int(np.asarray(bits_all).max()) <= W * 32, "width hint overflow"
    lens = (bits_np + 7) // 8
    total = int(lens.sum())

    # Decode inputs: per-tile word columns (as the container decoder builds
    # from the payload; here taken from the encoder output, tails zeroed).
    def cols_of(words, bits, wd):
        wn = np.asarray(words)
        bn = np.asarray(bits).astype(np.int64)
        nw = np.minimum((bn + 31) // 32, wd)
        keep = np.arange(wd, dtype=np.int64)[None, :] < nw[:, None]
        cols = np.where(keep, wn[:, :wd], 0).astype(np.uint32)
        # tail bits beyond ceil(bits/8) bytes are already zero: the encoder
        # flushes zero-padded partial words.
        return cols

    # One shared word width: a single compiled decode kernel per rep count.
    # Decode inputs are the encoder outputs of the last R2 variants, with
    # per-rep distinct tile order (columns rolled ON DEVICE by a per-call
    # roll vector; the shared batch-global prior is roll-invariant).
    wd = pc.bucket_words(int(np.asarray(bits_all).max() + 31) // 32)
    base_cols = jnp.asarray(cols_of(words, bits_all[-1], wd))
    last_variant = variant(seed - 1)

    def make_rep_decode(rep):
        @jax.jit
        def rep_decode(cols, rolls):  # (n_tiles, wd), (rep,)
            outs = []
            for r in range(rep):
                cr = jnp.roll(cols, rolls[r], axis=0)
                outs.append(
                    pc._decode_tiles_pallas(
                        cr, *meta[:2], prior_j, th, tw, c, cfg, False
                    )
                )
            # Probe one element of EVERY rep's output: a rep whose result
            # is entirely unused would be dead-code-eliminated, not timed.
            probes = jnp.stack([o[0, 0] for o in outs])
            return outs[-1], probes

        return rep_decode

    dec_walls = {}
    roll = 0
    for rep in (R1, R2):
        args = []
        for _ in range(iters + 1):
            args.append(
                (base_cols,
                 jnp.arange(roll, roll + rep, dtype=jnp.int32))
            )
            roll += rep
        dec_walls[rep], (bufs, _pr) = min_wall(
            make_rep_decode(rep), args, lambda r: r[0]
        )
    t_dec = max(1e-9, dec_walls[R2] - dec_walls[R1]) / (R2 - R1)

    # Correctness: the final rep decoded columns rolled by (roll - 1), so
    # the decoded tiles must equal the same roll of the encoded variant.
    decoded = np.asarray(bufs).reshape(tiles_np.shape)
    expect = np.roll(
        last_variant.reshape(tiles_np.shape), roll - 1, axis=0
    )
    assert np.array_equal(decoded, expect), "tiled round-trip mismatch"

    ratio = pixels * np.dtype(images[0].dtype).itemsize * (
        3 if images[0].ndim == 3 else 1
    ) / total
    mpxs = 2 * pixels / (t_enc + t_dec) / 1e6
    return mpxs, t_enc, t_dec, ratio, n_tiles, pixels


def _variants(images, it):
    vs = []
    hi = np.iinfo(images[0].dtype).max
    for im in images:
        v = im.copy()
        if v.ndim == 3:
            v[0, 2, 0] = (int(v[0, 2, 0]) + it) % hi
        else:
            v[0, 2] = (int(v[0, 2]) + it) % hi
        vs.append(v)
    return vs


def container_bench(images, engine="pallas"):
    """End-to-end container throughput: images in, FLCT bytes out, images
    back — through the batched serving API (parallel.batch), including
    host-side k-prior computation, header pack/parse, payload compaction,
    and device transfers (VERDICT r2 asked for container-level timing
    alongside the kernel-only number). No RTT correction: host<->device
    syncs are part of the product here.
    """
    from felics_tpu.config import TileConfig
    from felics_tpu.parallel.batch import (
        compress_tiled_batch,
        decompress_tiled_batch,
    )

    tc = TileConfig(tile_h=TILE, tile_w=TILE)
    pixels = sum(im.size // (3 if im.ndim == 3 else 1) for im in images)
    best_enc = best_dec = float("inf")
    # warm passes (compile both kernels at the batch shapes AND settle the
    # self-tuned payload/width hints so the timed passes reuse one program)
    for _ in range(2):
        decompress_tiled_batch(compress_tiled_batch(images, tc, engine), engine)
    for it in range(1, 6):
        # distinct inputs per iteration (tunnel executable cache, r1 advice)
        vs = _variants(images, it)
        t0 = time.perf_counter()
        blobs = compress_tiled_batch(vs, tc, engine)
        t1 = time.perf_counter()
        outs = decompress_tiled_batch(blobs, engine)
        t2 = time.perf_counter()
        for v, o in zip(vs, outs):
            assert np.array_equal(v, o), "container round-trip mismatch"
        best_enc = min(best_enc, t1 - t0)
        best_dec = min(best_dec, t2 - t1)
    return 2 * pixels / (best_enc + best_dec) / 1e6, best_enc, best_dec


def stream_bench(images, engine="pallas", chunk=3, depth=2):
    """Pipelined serving throughput: the same images as container_bench but
    split into chunks streamed through compress/decompress_tiled_stream,
    which dispatch chunk i+1 (upload + device chain + async result copy)
    BEFORE fetching chunk i — wire overlaps compute wherever the platform
    allows (VERDICT r3 item 3)."""
    from felics_tpu.config import TileConfig
    from felics_tpu.parallel.batch import (
        compress_tiled_stream,
        decompress_tiled_stream,
    )

    tc = TileConfig(tile_h=TILE, tile_w=TILE)
    pixels = sum(im.size // (3 if im.ndim == 3 else 1) for im in images)
    chunks0 = [images[i : i + chunk] for i in range(0, len(images), chunk)]
    best_enc = best_dec = float("inf")
    for _ in range(2):  # warm (chunk-shaped programs + hints)
        decompress_tiled_stream(
            compress_tiled_stream(chunks0, tc, engine, depth), engine, depth
        )
    for it in range(1, 6):
        vs = _variants(images, it)
        chunks = [vs[i : i + chunk] for i in range(0, len(vs), chunk)]
        t0 = time.perf_counter()
        blob_chunks = compress_tiled_stream(chunks, tc, engine, depth)
        t1 = time.perf_counter()
        out_chunks = decompress_tiled_stream(blob_chunks, engine, depth)
        t2 = time.perf_counter()
        for vchunk, ochunk in zip(chunks, out_chunks):
            for v, o in zip(vchunk, ochunk):
                assert np.array_equal(v, o), "stream round-trip mismatch"
        best_enc = min(best_enc, t1 - t0)
        best_dec = min(best_dec, t2 - t1)
    return 2 * pixels / (best_enc + best_dec) / 1e6, best_enc, best_dec


def flcs_jax_bench(images, iters=3):
    """Batched FLCS (single-stream container) through the vectorized jax
    engine both directions (VERDICT r4 missing #3: the direct analog of the
    reference's main path, src/compression.rs:76-148, gets an archived TPU
    number): compress_images_bytes — the parallel analyze/kscan/pack
    pipeline, one packing program per shape group — and
    decompress_images_bytes — the vmapped per-pixel lax.scan (FLCS decode
    is inherently serial per image; lanes = images). Returns separate
    enc/dec Mpx/s: the decode scan's step latency dominates and lumping
    them would hide it."""
    from felics_tpu.core import jax_codec

    pixels = sum(im.size // (3 if im.ndim == 3 else 1) for im in images)
    blobs = jax_codec.compress_images_bytes(images)  # warm/compile
    outs = jax_codec.decompress_images_bytes(blobs)
    for im, o in zip(images, outs):
        assert np.array_equal(im, o), "FLCS jax round-trip mismatch"
    best_enc = best_dec = float("inf")
    for it in range(1, iters + 1):
        vs = _variants(images, it)
        t0 = time.perf_counter()
        blobs = jax_codec.compress_images_bytes(vs)
        t1 = time.perf_counter()
        outs = jax_codec.decompress_images_bytes(blobs)
        t2 = time.perf_counter()
        for v, o in zip(vs, outs):
            assert np.array_equal(v, o), "FLCS jax round-trip mismatch"
        best_enc = min(best_enc, t1 - t0)
        best_dec = min(best_dec, t2 - t1)
    return pixels / best_enc / 1e6, pixels / best_dec / 1e6


def sharded_overhead_bench(images, iters=3):
    """encode_tiled_sharded on a ONE-device mesh vs the unsharded container
    encoder on the same image (VERDICT r4 stretch #8): the one
    scaling-adjacent number a single chip can produce — it bounds the
    shard_map/GSPMD + padding overhead at the bottom of the scaling curve.
    Returns (t_unsharded, t_sharded) best-of-N seconds."""
    import jax

    from felics_tpu.config import TileConfig
    from felics_tpu.parallel import tiling
    from felics_tpu.parallel.mesh import encode_tiled_sharded, make_tile_mesh

    tc = TileConfig(tile_h=TILE, tile_w=TILE)
    mesh = make_tile_mesh(jax.devices()[:1])
    img = images[0]
    a = tiling.compress_tiled_bytes(img, tc, engine="pallas")
    b = encode_tiled_sharded(img, mesh, tc, engine="pallas")
    assert a == b, "sharded encode must be byte-identical"
    best_u = best_s = float("inf")
    for it in range(1, iters + 1):
        v = _variants([img], it)[0]
        t0 = time.perf_counter()
        tiling.compress_tiled_bytes(v, tc, engine="pallas")
        t1 = time.perf_counter()
        encode_tiled_sharded(v, mesh, tc, engine="pallas")
        t2 = time.perf_counter()
        best_u = min(best_u, t1 - t0)
        best_s = min(best_s, t2 - t1)
    return best_u, best_s


def flcs_interop_check(images):
    from felics_tpu.api import compress_image_bytes

    jax_bytes = compress_image_bytes(images[0], backend="jax")
    native_bytes = compress_image_bytes(images[0], backend="native")
    assert jax_bytes == native_bytes, "FLCS jax/native bitstream mismatch"


def main():
    import jax

    cache = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from felics_tpu.format import ColorType, PixelDepth

    images = load_batch()
    base_mpxs, _ = native_baseline(images)
    mpxs, t_enc, t_dec, ratio, n_tiles, pixels = tpu_bench(
        images, ColorType.GRAY, PixelDepth.EIGHT
    )
    cont_mpxs, c_enc, c_dec = container_bench(images)
    strm_mpxs, s_enc, s_dec = stream_bench(images)

    # Secondary corpus classes on chip (VERDICT r4 item 4): rgb8 + gray16.
    rgb = load_suite("rgb/8bit", (512, 512, 3), np.uint8, 8)
    g16 = load_suite("grayscale/16bit", (512, 512), np.uint16, 4)
    rgb_mpxs, _, _, rgb_ratio, _, _ = tpu_bench(
        rgb, ColorType.RGB, PixelDepth.EIGHT
    )
    rgb_cont, _, _ = container_bench(rgb, engine="auto")
    rgb_strm, _, _ = stream_bench(rgb, engine="auto", chunk=2)
    g16_mpxs, _, _, g16_ratio, _, _ = tpu_bench(
        g16, ColorType.GRAY, PixelDepth.SIXTEEN
    )
    g16_cont, _, _ = container_bench(g16, engine="auto")
    g16_strm, _, _ = stream_bench(g16, engine="auto", chunk=2)

    flcs_enc, flcs_dec = flcs_jax_bench(images[:4])
    so_u, so_s = sharded_overhead_bench(images)
    flcs_interop_check(images)

    # Self-consistency (VERDICT r4 item 2): one-shot and pipelined stream
    # are timed back-to-back in this same process, best-of-5 each; the
    # ratio is archived so README/DESIGN claims regenerate from THIS file.
    def ratio_note(strm, cont):
        r = strm / cont
        return f"{r:.2f}x" + ("" if r >= 1.0 else " (stream SLOWER: wire did not overlap this run)")

    result = {
        "metric": "FLCT tiled encode+decode throughput, 1 TPU chip "
        f"({len(images)}x512x512 gray8, tile {TILE}, ratio {ratio:.3f}, "
        f"enc {t_enc*1e3:.0f}ms dec {t_dec*1e3:.0f}ms; "
        f"container-level {cont_mpxs:.1f} Mpx/s "
        f"[{cont_mpxs/base_mpxs:.1f}x, enc {c_enc*1e3:.0f}ms "
        f"dec {c_dec*1e3:.0f}ms]; "
        f"pipelined-stream {strm_mpxs:.1f} Mpx/s "
        f"[stream/one-shot {ratio_note(strm_mpxs, cont_mpxs)}, "
        f"enc {s_enc*1e3:.0f}ms dec {s_dec*1e3:.0f}ms]; "
        f"rgb8 kernel {rgb_mpxs:.0f} Mpx/s ratio {rgb_ratio:.3f} "
        f"container {rgb_cont:.1f} stream {rgb_strm:.1f} Mpx/s "
        f"[stream/one-shot {ratio_note(rgb_strm, rgb_cont)}]; "
        f"gray16 kernel {g16_mpxs:.0f} Mpx/s ratio {g16_ratio:.3f} "
        f"container {g16_cont:.1f} stream {g16_strm:.1f} Mpx/s "
        f"[stream/one-shot {ratio_note(g16_strm, g16_cont)}]; "
        f"FLCS-jax 4x512x512 gray8: enc {flcs_enc:.1f} dec {flcs_dec:.2f} "
        f"Mpx/s (decode = vmapped serial scan); "
        f"sharded-1dev overhead {so_s/so_u - 1:+.0%} "
        f"({so_u*1e3:.0f}->{so_s*1e3:.0f}ms); "
        f"native-C++-1core baseline {base_mpxs:.1f} Mpx/s)",
        "value": round(mpxs, 2),
        "unit": "Mpx/s",
        "vs_baseline": round(mpxs / base_mpxs, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
