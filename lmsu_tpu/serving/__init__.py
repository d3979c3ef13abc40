"""Serving runtime: dynamic-batching engine + stdlib HTTP front-end.

The reference has no serving layer (its inference path is the eval loop in
visualize_predictions.py:11-81); this subsystem is the production analog
demanded by the TPU-first design brief: fixed-shape compiled batches,
dynamic micro-batching, async-dispatch pipelining, StableHLO-artifact
backends. See engine.py for the design notes.
"""

from lmsu_tpu.serving.engine import EngineOverloaded, ServingEngine
from lmsu_tpu.serving.http import make_server

__all__ = ["ServingEngine", "EngineOverloaded", "make_server"]
