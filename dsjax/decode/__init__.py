from dsjax.decode.greedy import GreedyDecoder  # noqa: F401
from dsjax.decode.beam import BeamCTCDecoder  # noqa: F401
