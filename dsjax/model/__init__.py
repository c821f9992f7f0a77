from dsjax.model.ds2 import DeepSpeech2, get_seq_lens, init_model  # noqa: F401
from dsjax.model.ctc import ctc_loss  # noqa: F401
