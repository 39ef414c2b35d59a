"""Does unrolling the ViT block scan let XLA pipeline across layers?
Sweep scan_unroll x {bf16-cast params} at the B=32 throughput peak."""
import sys

sys.path.insert(0, "/root/repo")
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import vit_config
from candidate_reranking_cir_tpu.models.vit import VisionTransformer
from bench import measure_rtt, rand_params, vit_fwd_flops
from tools.t_vit_sweep import chain_time


def main():
    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    flops = vit_fwd_flops()
    B = 32
    imgs = jnp.asarray(rng.normal(size=(B, 384, 384, 3)) * 0.3, jnp.float32)

    for unroll in (1, 2, 3, 4, 6, 12):
        cfg = dataclasses.replace(vit_config("base", 384),
                                  fused_attention=True, scan_unroll=unroll)
        model = VisionTransformer(cfg, jnp.bfloat16)
        params = rand_params(
            jax.eval_shape(lambda: model.init(jax.random.key(0), imgs[:2])),
            jax.random.key(1))

        def fwd(params, imgs, c):
            return model.apply(params, imgs + c)

        dt = chain_time(fwd, (params, imgs), rtt, iters=8)
        rate = B / dt
        print(f"unroll={unroll:2d}: {dt*1e3:7.2f} ms = {rate:6.1f} img/s "
              f"mfu={rate*flops/197e12:.3f}", flush=True)


if __name__ == "__main__":
    main()
