"""Evaluation: FID, Inception Score, transfer-consistency metrics."""

from weather_unet_tpu.evaluation.fid import (
    compute_statistics, frechet_distance, fid_from_activations, get_activations,
)
from weather_unet_tpu.evaluation.inception_score import inception_score_from_probs
