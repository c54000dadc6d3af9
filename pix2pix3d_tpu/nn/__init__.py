from .layers import (
    FullyConnected,
    Conv2d,
    EqualConv2d,
    normalize_2nd_moment,
    modulated_conv2d,
    minibatch_stddev,
)
from .mapping import MappingNetwork
from .synthesis import SynthesisLayer, ToRGBLayer, SynthesisBlock, SynthesisNetwork, Generator
from .discriminator import (
    DiscriminatorBlock,
    DiscriminatorEpilogue,
    Discriminator,
    SingleDiscriminator,
    DualDiscriminator,
    filtered_resizing,
)
from .encoder import Encoder
from .cond_mapping import (
    MaskMappingNetwork,
    MaskMappingNetworkDisentangle,
    EdgeMappingNetwork,
    EdgeMappingNetworkDisentangle,
)
from .superresolution import (
    SynthesisBlockNoUp,
    SuperresolutionHybrid8X,
    SuperresolutionHybrid4X,
    SuperresolutionHybrid2X,
    SuperresolutionHybrid2XSemantic,
    SuperresolutionHybrid8XDC,
    SuperresolutionHybrid8XDCSemantic,
    SuperresolutionHybridDeepfp32,
    build_superresolution,
)
from .stylegan3 import (GeneratorS3, SynthesisNetworkS3, SynthesisInput,
                        SynthesisLayerS3, modulated_conv2d_s3)
