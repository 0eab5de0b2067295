"""Per-layer conv utilization survey on the real TPU (VERDICT r1 item 3).

Times every conv shape in the cUNet forward (B=128, bf16) plus layout
variants (stem channel padding), reporting achieved TFLOP/s and MXU
utilization vs the v5e bf16 peak (~197 TFLOP/s).  One JSON line per layer.

Timing: lax.fori_loop chains n iterations inside one jit (input perturbed by
the loop index so XLA cannot CSE), with a full-reduce carry to keep the conv
live; the final float() host read is the only honest barrier over the axon
tunnel (CLAUDE.md).
"""

import json
import time

import numpy as np

PEAK_BF16 = 197e12


def time_fn(fn, args, n=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(i, acc):
            scale = 1 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
            y = fn(a[0] * scale, *a[1:])
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    r = float(run(*args))
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(r)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from weather_unet_tpu.ops import convs
    from weather_unet_tpu.ops.resize import upsample_bilinear_align_corners

    rng = np.random.default_rng(0)
    B = 128
    results = []

    def conv_case(name, hw, cin, cout, pad_to=None, ksize=3):
        cin_alloc = pad_to or cin
        x = jnp.asarray(rng.standard_normal((B, hw, hw, cin)).astype(np.float32),
                        jnp.bfloat16)
        if pad_to:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_to - cin)))
        k = jnp.asarray(
            rng.standard_normal((ksize, ksize, cin_alloc, cout)).astype(np.float32)
            * 0.05, jnp.bfloat16)
        b = jnp.zeros((cout,), jnp.bfloat16)

        def f(x, k, b):
            return jax.nn.relu(convs.conv2d(x, k, b, stride=1, padding=ksize // 2))

        dt = time_fn(f, (x, k, b))
        # real FLOPs (zero-pad channels don't add useful work)
        flops = 2 * B * hw * hw * cin * cout * ksize * ksize
        tf = flops / dt / 1e12
        rec = dict(name=name, hw=hw, cin=cin, cout=cout, ms=round(dt * 1e3, 3),
                   tflops=round(tf, 1), mxu_pct=round(100 * tf * 1e12 / PEAK_BF16, 1))
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # encoder
    conv_case("stem 3->64 @256", 256, 3, 64)
    conv_case("stem 3->64 @256 pad8", 256, 3, 64, pad_to=8)
    conv_case("stem 3->64 @256 pad128", 256, 3, 64, pad_to=128)
    conv_case("down1.2 64->64 @256", 256, 64, 64)
    conv_case("down2.1 64->128 @128", 128, 64, 128)
    conv_case("down2.2 128->128 @128", 128, 128, 128)
    conv_case("down3.1 128->256 @64", 64, 128, 256)
    conv_case("down3.2 256->256 @64", 64, 256, 256)
    conv_case("down4.1 256->512 @32", 32, 256, 512)
    conv_case("down4.2 512->512 @32", 32, 512, 512)
    # decoder split-concat stage-1 convs (dominant FLOPs)
    conv_case("up3.1 768->256 @64", 64, 768, 256)
    conv_case("up3.2 256->256 @64", 64, 256, 256)
    conv_case("up2.1 384->128 @128", 128, 384, 128)
    conv_case("up2.2 128->128 @128", 128, 128, 128)
    conv_case("up1.1 192->64 @256", 256, 192, 64)
    conv_case("up1.2 64->64 @256", 256, 64, 64)
    conv_case("conv_last 64->3 1x1 @256", 256, 64, 3, ksize=1)

    # upsample (matmul form) at the three decoder resolutions
    for hw, c in ((32, 512), (64, 256), (128, 128)):
        x = jnp.asarray(rng.standard_normal((B, hw, hw, c)).astype(np.float32),
                        jnp.bfloat16)
        dt = time_fn(lambda x: upsample_bilinear_align_corners(x), (x,))
        gb = (B * hw * hw * c + B * 4 * hw * hw * c) * 2 / 1e9
        rec = dict(name=f"upsample2x @{hw} c{c}", ms=round(dt * 1e3, 3),
                   hbm_gb=round(gb, 2), gbps=round(gb / dt, 0))
        results.append(rec)
        print(json.dumps(rec), flush=True)

    total_conv_ms = sum(r["ms"] for r in results
                        if "cin" in r and "pad" not in r["name"])
    print(json.dumps({"name": "sum of standalone conv layers",
                      "ms": round(total_conv_ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
