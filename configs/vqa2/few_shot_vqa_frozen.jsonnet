// Frozen-style prompt template variant of the flagship eval
// (reference configs/vqa2/few_shot_vqa_frozen.jsonnet: identical to
// hotpotqa except QInput option "frozen").
local hotpotqa = import 'few_shot_vqa_hotpotqa.jsonnet';

local override = {
  "experiment_name": "few_shot_vqa_frozen",
  "model_config": {
    "input_modules": {
      "module_list": [
        {"type": "QInput", "option": "frozen",
         "separation_tokens": {"start": "", "end": ""}},
        {"type": "EmbeddingInput", "option": "default"},
      ],
    },
  },
};

std.mergePatch(hotpotqa, override)
