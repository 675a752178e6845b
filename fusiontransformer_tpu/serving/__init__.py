from fusiontransformer_tpu.serving.engine import InferenceEngine
from fusiontransformer_tpu.serving.server import InferenceServer

__all__ = ["InferenceEngine", "InferenceServer"]
