"""Deployment/serving subsystem: AOT export + micro-batching server.

No reference counterpart (the reference's only inference path is the
offline eval run, DiffuseSG/eval.py); this is TPU-native added value:
``jax.export`` ships the compiled sampler as a standalone artifact and
``server`` packs concurrent requests into fixed-shape device batches.
"""
from .export import (export_sampler, load_artifact, make_completion_fn,
                     make_serving_fn, make_sharded_completion_fn,
                     make_sharded_serving_fn, save_artifact)
from .server import BatchingSampler, serve

__all__ = ["export_sampler", "load_artifact", "make_completion_fn",
           "make_serving_fn", "make_sharded_completion_fn",
           "make_sharded_serving_fn", "save_artifact", "BatchingSampler",
           "serve"]
