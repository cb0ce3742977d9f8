from viewfusion_tpu.data.nmr import (  # noqa: F401
    NMRStream,
    create_nmr_stream,
    process_sample,
)
