"""Domain-adaptation data plumbing (reference research track).

Capabilities of ``datasets/selma_dataset.py`` (SELMA synthetic-depth source
domain), ``datasets/utils.py:multi_dataset_collate`` (grouping source/target
samples into ``{'src': ..., 'tar': ...}`` batches) and the teacher-student
validation flow (``engine/runner/loops.py``: run validation twice, once with
teacher/EMA weights and once with student weights).
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Tuple

from .datasets import CocoDispDataset


class SELMADataset(CocoDispDataset):
    """SELMA source-domain dataset (reference datasets/selma_dataset.py):
    CocoDispDataset whose GT depth maps are SELMA's 24-bit packed inverse
    depth — decoded by ``transforms.load_depth(mode='selma')``
    (loading_disparity.py:215-219 semantics)."""

    def __init__(self, *args, depth_mode: str = 'selma', **kwargs):
        super().__init__(*args, depth_mode=depth_mode, **kwargs)


def multi_dataset_collate(src_samples: List[dict],
                          tar_samples: List[dict]) -> Dict[str, List[dict]]:
    """Group source-domain and target-domain samples (datasets/utils.py:4-47
    behavior: the DA train step consumes dict(src=..., tar=...))."""
    return {'src': src_samples, 'tar': tar_samples}


def teacher_student_evaluate(run_eval: Callable[[dict], dict],
                             student_vars: dict, teacher_vars: dict
                             ) -> Dict[str, dict]:
    """Run the same evaluation closure with student and teacher (EMA)
    weights (TeacherStudentValLoop capability, engine/runner/loops.py:9-38).
    """
    return {'student': run_eval(student_vars),
            'teacher': run_eval(teacher_vars)}
