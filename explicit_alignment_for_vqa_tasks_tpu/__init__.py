"""explicit_alignment_for_vqa_tasks_tpu — TPU-native framework for few-shot VQA
via explicit alignment (visual prefixes spliced at sentinel positions).

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
rs-anderson/explicit-alignment-for-vqa-tasks (reference mounted read-only at
/root/reference): a frozen seq2seq LM (T0/T5 family) or decoder-only LM (GPT-2)
receives a "visual prefix" — CLIP image embeddings projected into the LM
embedding space by a small trainable mapping network — and few-shot VQA prompts
are assembled by splicing per-image prefixes into tokenized prompts at
``<extra_id_i>`` sentinel positions before generation.

Package layout:
  utils/     config system (jsonnet-subset), VQA eval protocol, caching, logging
  ops/       TPU compute ops: prefix splicing, flash attention (Pallas), KV-cache
             decoding, cosine top-k kNN
  models/    Flax models: T5/T0, GPT-2, CLIP ViT; mapping networks; VCT0/ClipCap
  parallel/  device mesh, sharding rules, multi-host gather
  data/      host data pipeline: dataset-module registry, ModuleParser,
             in-context example formatting
  trainers/  executors (train/eval loops), optimization, checkpointing, metrics
  tools/     offline pipelines: CLIP feature extraction, visualization
  in_context_example_selection/  RICES kNN retrieval (TPU top-k, FAISS-free)
"""

__version__ = "0.1.0"
