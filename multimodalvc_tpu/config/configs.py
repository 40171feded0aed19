"""Root training configuration tree.

Mirrors the reference's config groups (common / distributed / dataset /
optimization / checkpoint / generation; reference:
fairseq/fairseq/dataclass/configs.py) re-shaped for a JAX runtime: the
distributed group describes a device-mesh layout instead of NCCL process
groups, and precision is a dtype policy instead of fp16 flags.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from .structured import MISSING


@dataclass
class CommonConfig:
    seed: int = 1
    log_interval: int = 100
    log_format: str = "simple"  # simple | json
    tensorboard_logdir: Optional[str] = None
    # extra metric sinks (reference: logging/progress_bar.py W&B / AzureML
    # wrappers); each is a no-op when unset or when the client lib is absent
    wandb_project: Optional[str] = None
    azureml_logging: bool = False
    metrics_jsonl: Optional[str] = None  # append-only JSONL metrics stream
    # dtype policy: params are kept in fp32; compute runs in this dtype.
    compute_dtype: str = "bfloat16"
    profile: bool = False
    profile_dir: str = "profiles"
    # kill/log when one optimizer step blocks longer than this (0 = off;
    # DistributedTimeoutWrapper analog)
    step_timeout_s: float = 0.0
    # assert the step function compiles at most this many times (XLA recompile
    # guard; reference analog: trainer.py:1382-1397 compilation-count check)
    max_compilations: int = 4


@dataclass
class MeshConfig:
    """Device-mesh layout. Product of axis sizes must equal device count.

    -1 on one axis means "fill with remaining devices".
    Replaces the reference's DistributedTrainingConfig (process-group world
    sizes, NCCL backends); here parallelism is expressed as named mesh axes
    consumed by pjit sharding rules.
    """

    data: int = -1
    fsdp: int = 1
    tensor: int = 1
    sequence: int = 1
    expert: int = 1
    pipeline: int = 1
    # number of microbatches when pipeline > 1
    microbatches: int = 1


@dataclass
class DatasetConfig:
    data: str = MISSING  # manifest directory
    train_subset: str = "train"
    valid_subset: str = "valid"
    batch_size: Optional[int] = None
    max_tokens: Optional[int] = 1000  # video frames budget per batch
    num_workers: int = 4
    required_batch_size_multiple: int = 8
    skip_invalid_size_inputs_valid_test: bool = True
    validate_interval: int = 1
    # skip validation entirely (reference: dataclass/configs.py:482
    # dataset.disable_validation); checkpoints then track train loss
    disable_validation: bool = False
    # beam-decode this many validation batches per validation pass and report
    # corpus WER (reference: src/criterion.py:100-134 decodes at every valid
    # step).  -1 = all batches, 0 = off.  Enables
    # checkpoint.best_checkpoint_metric: wer.
    valid_wer_batches: int = 0
    # static-shape bucketing: samples are padded up to the nearest bucket
    # boundary so XLA compiles a small fixed set of programs.
    length_buckets: Tuple[int, ...] = (100, 200, 300, 400, 500)


@dataclass
class OptimizationConfig:
    max_update: int = 30000
    max_epoch: int = 0
    lr: float = 1e-4
    optimizer: str = "adamw"
    adam_betas: Tuple[float, float] = (0.9, 0.98)
    adam_eps: float = 1e-8
    weight_decay: float = 0.01
    clip_norm: float = 1.0
    update_freq: int = 1  # gradient accumulation steps
    lr_scheduler: str = "cosine"
    warmup_updates: int = 500
    min_lr: float = 1e-6
    # manual scheduler milestones: {step: lr}
    lr_milestones: Optional[Dict[str, float]] = None
    # triangular scheduler (reference:
    # fairseq/fairseq/optim/lr_scheduler/triangular_lr_scheduler.py):
    # full cycle length in updates (0 -> 2*warmup_updates) and per-cycle
    # peak shrink factor (1.0 -> no annealing)
    lr_period_updates: int = 0
    lr_shrink: float = 1.0
    # tri_stage phase fractions (warmup, hold, decay) of max_update
    # (reference: tri_stage_lr_scheduler.py phase_ratio); None keeps the
    # warmup_updates-based split with a 40% hold
    phase_ratio: Optional[Tuple[float, float, float]] = None
    # reduce_lr_on_plateau scheduler (reference:
    # optim/lr_scheduler/reduce_lr_on_plateau.py): shrink the LR by
    # lr_shrink after lr_patience+1 validations without a relative
    # improvement > lr_threshold; plateau_maximize follows
    # checkpoint.maximize_best_checkpoint_metric (wired in cli/train.py)
    lr_patience: int = 0
    lr_threshold: float = 1e-4
    plateau_maximize: bool = False
    # probability floor for skipping a step on non-finite grads
    skip_nonfinite_grads: bool = True


@dataclass
class CheckpointConfig:
    save_dir: str = "checkpoints"
    save_interval_updates: int = 0
    keep_interval_updates: int = -1
    keep_last_epochs: int = -1
    keep_best_checkpoints: int = 1
    best_checkpoint_metric: str = "loss"
    maximize_best_checkpoint_metric: bool = False
    patience: int = -1
    reset_optimizer: bool = False
    # checkpoint name, or a comma-separated list for an eval-time ensemble
    # (reference: checkpoint_utils.load_model_ensemble_and_task)
    restore_file: str = "checkpoint_last"
    # how a multi-checkpoint restore combines members: "logprob" = true
    # log-prob-averaged ensemble decode (fairseq EnsembleModel), "average" =
    # parameter averaging (fairseq scripts/average_checkpoints.py)
    ensemble_mode: str = "logprob"
    # with a multi-member restore_file, a missing member raises instead of
    # silently decoding a smaller ensemble; set False to keep the remainder
    strict_ensemble: bool = True
    # torch .pt checkpoint to import weights from (reference interop)
    init_from_pt: Optional[str] = None
    async_save: bool = True


@dataclass
class GenerationConfig:
    beam: int = 5
    max_len: int = 100
    min_len: int = 1
    temperature: float = 0.3
    length_penalty: float = 1.0
    no_repeat_ngram_size: int = 0
    # weight-only quantized decode: None | "int8" | "int4" (serving format;
    # reference analog: NF4 4-bit via bitsandbytes, src/model.py:231-238)
    weight_quant: Optional[str] = None
    # beam reorder strategy: None = auto (ancestry-select decode attention on
    # TPU — numerically equivalent to the gather reorder and faster; gather
    # elsewhere); True/False force it (ops/decode_attention.py)
    ancestry_decode: Optional[bool] = None
    # KV-cache serving format: None (exact bf16) | "int8" (per-vector
    # symmetric int8 with in-VMEM dequant — lossy, serving opt-in; implies
    # the ancestry decode path)
    kv_cache_quant: Optional[str] = None
    # run encoders + prompt assembly in N sequential chunks (peak-memory
    # lever for large serving batches; 0/1 = full batch)
    encoder_microbatch: int = 0
    # lexically-constrained decoding: None | "unordered" | "ordered"
    # (fairseq-cli --constraints, fairseq/fairseq_cli/generate.py +
    # fairseq/fairseq/search.py:433-814).  Consumed by cli/eval.py +
    # tasks.decode_to_text; constraint phrases come from constraints_file
    constraints: Optional[str] = None
    # per-utterance constraint phrases: line N applies to manifest sample N
    # (fairseq appends them to each input line; the manifest is our input
    # order), tab-separated phrases, tokenized with the task tokenizer
    constraints_file: Optional[str] = None


@dataclass
class TrainRootConfig:
    common: CommonConfig = field(default_factory=CommonConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    generation: GenerationConfig = field(default_factory=GenerationConfig)
    task: Dict[str, Any] = field(default_factory=dict)  # includes 'name'
    model: Dict[str, Any] = field(default_factory=dict)  # includes 'name'
    criterion: Dict[str, Any] = field(default_factory=dict)  # includes 'name'
