from .scene_sampler import RecordingSceneSampler, SceneSamplerError
from .record_dataset import record_dataset, record_chunk
