from pyspark_bigdata_sars_cov_2_analysis_spark.ml.classify import (
    confusion_matrix,
    evaluate_accuracy,
    train_classifiers,
)

__all__ = ["confusion_matrix", "evaluate_accuracy", "train_classifiers"]
