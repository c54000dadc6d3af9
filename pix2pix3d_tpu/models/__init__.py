from .triplane import (
    OSGDecoder,
    OSGDecoderSemantic,
    OSGDecoderSemanticEntangle,
    OSGDecoderSemanticLateSeparate,
    GeneratorCond,
    TriPlaneGenerator,
    TriPlaneSemanticGenerator,
    TriPlaneSemanticEntangleGenerator,
    TriPlaneSemanticEntangleGeneratorWithBG,
    build_generator,
    MAPPING_REGISTRY,
)
