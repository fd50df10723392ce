"""Evaluation: voting sphere inference, whole-cloud evaluator, chunk eval."""

from mvkpconv_tpu.eval.evaluator import Evaluator
from mvkpconv_tpu.eval.voting import VotingTester

__all__ = ["Evaluator", "VotingTester"]
