"""Docking pipeline (reference deepchem/dock/docking.py:19 Docker)."""

from __future__ import annotations

import logging
import tempfile
from typing import Generator, Optional, Tuple

logger = logging.getLogger(__name__)


class Docker:
    """Generate and optionally featurize+score docked poses
    (reference docking.py:19)."""

    def __init__(self, pose_generator, featurizer=None,
                 scoring_model=None):
        if scoring_model is not None and featurizer is None:
            raise ValueError(
                'featurizer is required when a scoring model is used')
        self.pose_generator = pose_generator
        self.featurizer = featurizer
        self.scoring_model = scoring_model

    def dock(self, molecular_complex: Tuple[str, str],
             centroid=None, box_dims=None,
             exhaustiveness: int = 10, num_modes: int = 9,
             num_pockets: Optional[int] = None,
             out_dir: Optional[str] = None,
             use_pose_generator_scores: bool = False) -> Generator:
        """Yields (pose, score) or poses (reference docking.py:40)."""
        outputs = self.pose_generator.generate_poses(
            molecular_complex, centroid, box_dims, exhaustiveness,
            num_modes, num_pockets, out_dir,
            generate_scores=use_pose_generator_scores)
        if use_pose_generator_scores:
            complexes, scores = outputs
        else:
            complexes, scores = outputs, None
        for i, posed in enumerate(complexes):
            if self.scoring_model is not None:
                feats = self.featurizer.featurize([posed])
                import numpy as np
                from deepchem_tpu.data import NumpyDataset
                score = self.scoring_model.predict(
                    NumpyDataset(np.asarray(feats)))
                yield posed, score
            elif scores is not None:
                yield posed, scores[i] if i < len(scores) else None
            else:
                yield posed
