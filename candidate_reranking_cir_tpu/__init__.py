"""candidate_reranking_cir_tpu — a TPU-native (JAX/Flax/pjit/Pallas) framework for
two-stage Composed Image Retrieval (CIR): candidate filtering + candidate re-ranking.

Re-designed from scratch for TPU hardware with the capabilities of the reference
implementation of "Candidate Set Re-ranking for Composed Image Retrieval with Dual
Multi-modal Encoder" (TMLR 2024). The compute path is JAX/XLA (+ Pallas kernels),
parallelism is expressed with jax.sharding over a device Mesh, and all hot loops are
static-shape batched programs (no data-dependent Python control flow under jit).

Package map
-----------
- ``config``     typed configuration tree (model/data/train/mesh), YAML/JSON loadable
- ``models``     Flax modules: ViT, MED text encoder, dual-stream re-rank encoder,
                 stage-I retrieval model, stage-II re-ranker, WordPiece tokenizer
- ``ops``        compute primitives: fused attention (XLA + Pallas), top-k retrieval,
                 device-side image preprocessing
- ``parallel``   mesh construction, sharding rules, global-batch contrastive loss
- ``runtime``    train states, optimizers/schedules, checkpointing (Orbax + PyTorch
                 interop), mixed-precision policy
- ``data``       CIRR / Fashion-IQ manifests, caption composition, batch loading,
                 top-k artifact IO
- ``retrieval``  index building, recall metric engine, re-rank eval, submissions
- ``cli``        entry points mirroring the reference's scripts and flags
"""

__version__ = "0.1.0"
