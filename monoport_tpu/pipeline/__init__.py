from .runtime import Pipeline, StageStats
from .streamer import (CaptureStreamer, ImageListStreamer, VideoListStreamer,
                       open_stream)

__all__ = ["Pipeline", "StageStats", "CaptureStreamer", "ImageListStreamer",
           "VideoListStreamer", "open_stream"]
