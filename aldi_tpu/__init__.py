"""aldi_tpu: a TPU-native domain-adaptive object detection framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of justinkay/aldi
(Align and Distill, TMLR 2025) plus the Detectron2 substrate slice it relies
on. See SURVEY.md at the repo root for the component inventory this package
implements.
"""

__version__ = "0.1.0"
