"""mhim_mil_tpu — a TPU-native JAX/Pallas framework for whole-slide-image
multiple-instance learning (MIL).

Re-designed from scratch with the capabilities of DearCaat/MHIM-MIL
(reference layer map: SURVEY.md §1):

- ``ops``      masked/batched MIL primitives (top-k masking, masked softmax,
               Nystrom attention, selective scans) incl. Pallas TPU kernels.
- ``models``   the MIL model zoo (ABMIL, TransMIL, DSMIL, CLAM, DTFD, IBMIL,
               RRT-MIL, Mamba-2D) and the flagship MHIM teacher/student wrapper.
- ``engine``   jitted train/eval steps, metric stack, k-fold experiment driver.
- ``data``     feature-store readers, CSV splits, length-bucketed batching.
- ``parallel`` mesh construction and sharding rules (dp over bags, sp over
               instances).
- ``utils``    schedules, EMA, checkpointing, seeding.

Every model operates on *batched padded bags*: ``feats[B, N, D]`` with a
boolean validity mask ``mask[B, N]`` — unlike the reference, which runs
batch=1 with dynamic bag lengths (reference: datasets/dataloader.py:14-46).
"""

__version__ = "0.1.0"
