from detzero_tpu.models.tracking.tracker import DetZeroTracker
from detzero_tpu.models.tracking.track_manager import TrackManager
from detzero_tpu.models.tracking.post_process import PostProcessor
