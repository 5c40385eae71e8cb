"""NN layers, losses, initializers — each with an explicit hand-written VJP
(≈ reference lib/layer.c, lib/conv.c, lib/norm.c and the models' in-line
backward derivations)."""

from big_linear_algebra_tpu.nn.dense import dense  # noqa: F401
from big_linear_algebra_tpu.nn.losses import (  # noqa: F401
    cross_entropy_loss,
    hinge_loss,
    mse_loss,
    softmax_cross_entropy,
)
from big_linear_algebra_tpu.nn.init import (  # noqa: F401
    he_uniform,
    uniform_init,
    xavier_uniform,
)
