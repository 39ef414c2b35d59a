"""Dump the compiled ViT-forward HLO and map the profiler's hot fusion names
to their op content (what are fusion.209/211/213 / add_add_fusion.2?)."""
import sys

sys.path.insert(0, "/root/repo")
import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

from candidate_reranking_cir_tpu.config import vit_config
from candidate_reranking_cir_tpu.models.vit import VisionTransformer
from bench import rand_params


def main():
    rng = np.random.default_rng(0)
    B = 32
    imgs = jnp.asarray(rng.normal(size=(B, 384, 384, 3)) * 0.3, jnp.float32)
    cfg = dataclasses.replace(vit_config("base", 384), fused_attention=True)
    model = VisionTransformer(cfg, jnp.bfloat16)
    params = rand_params(
        jax.eval_shape(lambda: model.init(jax.random.key(0), imgs[:2])),
        jax.random.key(1))
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    lowered = fwd.lower(params, imgs)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/vit_hlo.txt", "w") as f:
        f.write(txt)
    # print each fusion's root + first few ops
    for m in re.finditer(r"^%?(?P<name>[\w.-]*fusion[\w.-]*)\s*=?.*calls=(?P<called>[\w.-]+)", txt, re.M):
        pass
    # simpler: list fusion instruction lines
    for ln in txt.splitlines():
        s = ln.strip()
        if re.match(r"%?[\w.-]*fusion[\w.-]*\s*=", s) and "kind=" in s:
            print(s[:240])


if __name__ == "__main__":
    main()
