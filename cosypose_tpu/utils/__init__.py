from .tensor_collection import PandasTensorCollection, TensorCollection, concatenate
from .logging import get_logger
from .timer import Timer
