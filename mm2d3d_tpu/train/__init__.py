from .batch import PointBatch, build_topology, flatten_points  # noqa: F401
from .step import EvalMetrics, MM2D3DTask, TrainState  # noqa: F401
