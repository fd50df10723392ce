"""Evaluation: voting sphere inference, whole-cloud evaluator, chunk eval,
serving export."""

from mvkpconv_tpu.eval.eval2d import evaluate_frames
from mvkpconv_tpu.eval.evaluator import Evaluator
from mvkpconv_tpu.eval.export import ServingModel, export_inference
from mvkpconv_tpu.eval.voting import VotingTester

__all__ = [
    "Evaluator",
    "ServingModel",
    "VotingTester",
    "evaluate_frames",
    "export_inference",
]
