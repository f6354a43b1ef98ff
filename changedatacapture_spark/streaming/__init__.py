from changedatacapture_spark.streaming.sink import SnapshotTable
from changedatacapture_spark.streaming.pipeline import CdcPipeline

__all__ = ["SnapshotTable", "CdcPipeline"]
