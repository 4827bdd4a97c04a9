from wicca_tpu.codec.container import deserialize, inspect, load, save, serialize
from wicca_tpu.codec.pipeline import (
    CodeStream,
    compression_ratio,
    decode,
    decode_at_level,
    decode_region,
    encode,
    entropy_ratio,
    estimated_entropy_bytes,
    icon_from_stream,
    with_metadata,
)
from wicca_tpu.codec.rd import (
    encode_to_bpp,
    encode_to_psnr,
    plot_rd_curve,
    rd_curve,
    rd_point,
)
from wicca_tpu.codec.rd import allocate as rd_allocate
from wicca_tpu.codec.rd import measure as rd_measure
from wicca_tpu.codec.rd import truncate as rd_truncate
from wicca_tpu.codec.transfer import fetch_stream, put_stream
from wicca_tpu.codec.roi import apply_roi
from wicca_tpu.codec.batch import decode_folder, encode_folder
from wicca_tpu.codec.transcode import drop_finest_levels, transcode
