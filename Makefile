.PHONY: test test-all bench bench-e2e sample train-smoke synth-example

# fast set (~4 min); full suite (test-all) takes ~15 min on CPU
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

sample:
	python -m scail_tpu.cli.sample_video \
	  --base configs/video_model/scail_14b.yaml configs/sampling/pose_cli.yaml \
	  --input-type txt --input-file prompts_smoke.txt
