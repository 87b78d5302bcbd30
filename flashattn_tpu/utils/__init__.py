from flashattn_tpu.utils.verify import verify_results, VerifyReport

__all__ = ["verify_results", "VerifyReport"]
