from ctagan_tpu.serving.server import SynthesisService, serve
