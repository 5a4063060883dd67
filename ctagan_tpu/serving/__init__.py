from ctagan_tpu.serving.server import SynthesisService, serve
from ctagan_tpu.serving.export import export_generator, load_exported
