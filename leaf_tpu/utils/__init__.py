from leaf_tpu.utils.meters import AverageMeter
from leaf_tpu.utils.results import ResultsLedger, TimingLedger
from leaf_tpu.utils.logging_utils import setup_logging

__all__ = ["AverageMeter", "ResultsLedger", "TimingLedger", "setup_logging"]
