local base_tags = ['vqa', 'tpu'];
{ tags: base_tags + ['few_shot'] + [], n: std.length(base_tags + [1]) }
