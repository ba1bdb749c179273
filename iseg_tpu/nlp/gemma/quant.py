"""Back-compat alias: the weight-only int8 quantizer is generic pytree
machinery and lives in :mod:`iseg_tpu.ops.quant`."""

from iseg_tpu.ops.quant import (  # noqa: F401
    QTensor,
    dequantize_tree,
    is_quantized,
    quantize_tree,
)
