from . import neuralnet, feedforward
from .neuralnet import (
    Activation,
    act_logistic,
    act_map,
    act_map2,
    act_relu,
    act_softmax,
    act_tanh,
    activation_by_name,
    cross_entropy,
    logistic,
    softmax,
    squared_error,
)
from .feedforward import Network, ff_layer, gen_net, lift_net
from .recurrent import RecurrentNetwork, fully_connected, stateless
from .autoencoder import Encoder
from . import recurrent, autoencoder, training
from . import optim, trainer, fast
from .optim import adam, adam8bit, adamw, momentum, sgd
from .trainer import fit, fit_sequences
from .serve import Predictor, SequencePredictor
