"""Deployment-export subsystem.

- onnx_proto:   dependency-free ONNX protobuf writer/reader (wire format)
- jaxpr_to_onnx: jaxpr -> ONNX graph converter (dynamic B/T)
- onnx_numpy:   numpy executor for the emitted op subset (offline parity)
- stablehlo:    jax.export serialization lives in bin/export_model.py
"""
