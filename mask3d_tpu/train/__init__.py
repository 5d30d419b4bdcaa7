"""Training/evaluation orchestration.

Rebuild of the reference training stack (`mask3d/trainer/trainer.py`,
`mask3d/models/matcher.py`, `mask3d/models/criterion.py`) on JAX/optax:
- `criterion` — Hungarian matching + CE/BCE/dice losses with deep supervision
- `loop`      — train/eval steps, optimizer, data-parallel sharding
- `checkpoint`— save/restore with tolerant key matching
"""

from mask3d_tpu.train.criterion import SetCriterion  # noqa: F401
