from safer2_recommender_tpu.data.dataset import (
    Bucket,
    Dataset,
    DeviceData,
    FoldInData,
)

__all__ = ["Bucket", "Dataset", "DeviceData", "FoldInData"]
