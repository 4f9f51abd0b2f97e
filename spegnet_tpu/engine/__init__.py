"""Engines: Trainer, Evaluator, Predictor."""

from spegnet_tpu.engine.trainer import Trainer
from spegnet_tpu.engine.evaluator import Evaluator
from spegnet_tpu.engine.predictor import Predictor
