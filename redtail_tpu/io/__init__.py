"""Weight and data I/O: golden-data .bin files, TRT-format weight blobs,
pure-Python TF checkpoint (tensor-bundle) reading, and Caffe prototxt/
caffemodel parsing. Replaces the reference's offline conversion toolchain
(`stereoDNN/scripts/`) and the C++ readers (`sample_app/main.cpp:111-134`,
`tests_main.cpp:259-275`)."""

from redtail_tpu.io.golden import read_bin, write_bin
from redtail_tpu.io.trt_weights import read_trt_weights, write_trt_weights

__all__ = ["read_bin", "write_bin", "read_trt_weights", "write_trt_weights"]
