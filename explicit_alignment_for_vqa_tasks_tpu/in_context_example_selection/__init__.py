from .rices import (
    image_knn_from_text_knn,
    joint_ranking,
    question_knn,
    random_examples,
    run_full_pipeline,
)

__all__ = [
    "image_knn_from_text_knn",
    "joint_ranking",
    "question_knn",
    "random_examples",
    "run_full_pipeline",
]
