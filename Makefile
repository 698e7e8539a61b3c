.PHONY: test test-all bench bench-e2e sample train-smoke synth-example

# fast set ~16 min / full suite ~30 min on the current 1-core host
# (multi-core hosts are several times faster); run long suites via
# `nohup make test-all > test.log &`
test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-e2e:
	python scripts/bench_e2e.py

bench-14b-int4:
	python scripts/bench_14b_quant.py --bits 4

train-smoke:
	python scripts/smoke_train_tpu.py

synth-example:
	python scripts/make_synthetic_example.py examples_synth/001

# CPU-forced random-init smoke at reduced geometry (the 14B bf16 model
# does not fit one 16GB v5e chip, and full-geometry CPU sampling is
# hours); full-size sampling runs on a TPU mesh with real weights.
sample:
	python -m scail_tpu.cli.sample_video --platform cpu \
	  --base configs/video_model/scail_1p3b.yaml configs/sampling/pose_cli.yaml \
	  --input-type txt --input-file prompts_smoke.txt \
	  --sampling-steps 2 --image-size 128 224 --sampling-num-frames 9
