from dsjax.data.dataset import SpectrogramDataset, Batch, collate  # noqa: F401
from dsjax.data.sampler import BucketBatchSampler, DistributedBucketSampler  # noqa: F401
from dsjax.data.loader import DataPipeline  # noqa: F401
