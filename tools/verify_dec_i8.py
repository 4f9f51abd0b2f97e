"""One-shot real-TPU verification of the int8 fused decoder path:
fused_decoder_block(int8=True) vs the decomposed f32 reference at a small
dec2-like geometry, plus a flagship SPEGNet jit forward smoke.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from spegnet_tpu.ops import fused_decoder as fd
from spegnet_tpu.ops.fused_upsample_conv import d2s_nhwc

print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(0)
dt = jnp.bfloat16
b, s, cin, cm, sh = 2, 128, 128, 64, 8
x = jnp.asarray(rng.standard_normal((b, s, s, cin)).astype(np.float32), dt)
k1 = jnp.asarray(rng.standard_normal((3, 3, cin, cm)).astype(np.float32) * .05)
b1 = jnp.zeros(cm)
k2 = jnp.asarray(rng.standard_normal((3, 3, cm, cm)).astype(np.float32) * .05)
bn = dict(gamma=jnp.ones(cm), beta=jnp.zeros(cm),
          mean=jnp.zeros(cm), var=jnp.ones(cm))
hw = jnp.asarray(rng.standard_normal((cm, 1)).astype(np.float32))
hb = jnp.zeros(1)
params = fd.pack_params(k1, b1, bn, k2, b1, bn, head_w=hw, head_b=hb, dtype=dt)


@jax.jit
def run_i8(x):
    strips = fd.make_strips(x, k1, dtype=dt)
    out, pred = fd.fused_decoder_block(x, params, strips, sh=sh, int8=True)
    return d2s_nhwc(out), pred


@jax.jit
def run_ref(x):
    return fd.decoder_block_reference(
        x.astype(jnp.float32), k1, b1, bn, k2, b1, bn, head_w=hw, head_b=hb)


yi, pi = run_i8(x)
yr, pr = run_ref(x)
err = float(jnp.max(jnp.abs(yi.astype(jnp.float32) - yr.astype(jnp.float32))))
scale = float(jnp.max(jnp.abs(yr)))
pi = pi.reshape(b, 2 * s, 2 * s, 1)
perr = float(jnp.max(jnp.abs(pi.astype(jnp.float32) - pr.astype(jnp.float32))))
print(f"int8 fused vs f32 ref: maxerr {err:.4f} (scale {scale:.2f}), "
      f"rel {err / scale:.4f}, head maxerr {perr:.4f}", flush=True)
assert err / scale < 0.05, "int8 decoder diverged on TPU"

# flagship forward smoke
import time

from spegnet_tpu.models import SPEGNet, SPEGNetConfig

cfg = SPEGNetConfig(variant="large", compute_dtype="bfloat16")
model = SPEGNet(cfg)
key = jax.random.PRNGKey(0)
xi = jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
t0 = time.time()
variables = jax.jit(lambda k, x: model.init(k, x, train=False))(key, xi)
jax.block_until_ready(variables)
print(f"init done in {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
out = fwd(variables, xi)
m = out["predictions"][-1]
print("flagship forward ok:", jnp.asarray(m).shape,
      float(jnp.mean(jnp.asarray(m, jnp.float32))), flush=True)
print("VERIFY_OK", flush=True)
