"""Streaming runtime: the in-process node graph replacing the reference's
ROS pub/sub topology (camera -> DNN nodes -> controller,
`ros/packages/caffe_ros/launch/everything.launch`), plus profiling,
compile-cache management, frame sources, and visualization."""

from redtail_tpu.runtime.graph import (
    ApproxTimeSync,
    Node,
    NodeGraph,
    Topic,
)
from redtail_tpu.runtime.profiler import StageProfiler
from redtail_tpu.runtime.cache import enable_compilation_cache
from redtail_tpu.runtime.sources import FrameSource, ImageFileSource
from redtail_tpu.runtime.viz import disp_to_color, make_mosaic

__all__ = [
    "Topic",
    "Node",
    "NodeGraph",
    "ApproxTimeSync",
    "StageProfiler",
    "enable_compilation_cache",
    "FrameSource",
    "ImageFileSource",
    "disp_to_color",
    "make_mosaic",
]
