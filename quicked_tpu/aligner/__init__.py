from quicked_tpu.aligner.batch import BatchResult, align_batch_full  # noqa: F401
