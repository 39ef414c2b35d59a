from candidate_reranking_cir_tpu.ops.attention import (
    dot_product_attention,
    make_additive_mask,
    pair_cross_attention,
)
