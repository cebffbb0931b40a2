"""Programmatic configuration example.

Copy to your working directory as ``config.py`` (and remove/rename any
config.yaml + input_schemas.yaml there — YAML mode wins when both exist),
then run ``python main.py``.

Schema list layout:
[path, column_number(1-based), has_header, convert_to_percents,
 num_whole_digits, decimal_places, num_bins, randomness_size,
 cross_attention, modality_name]
"""

# Training hyperparameters
batch_size = 8
block_size = 6
max_iters = 20000
eval_interval = 50
eval_iters = 40
learning_rate = 3e-4
device = "auto"

# Model architecture
n_embd = 16
n_head = 4
n_layer = 4
dropout = 0.2
fixed_values = [-0.5, -0.2, -0.1, 0, 0.1, 0.2, 0.5]

# Paths and run settings
project_file_path = "./"
model_file_name = project_file_path + "output/" + "TransformerModel.ckpt"
output_file_name = "training_run.txt"
validation_size = 0.1
num_validation_files = 0
create_new_model = 1
save_model = 1

# Modality definitions (empty lists are skipped)
num_input_schemas = 10
input_schema_1 = ["./examples/demo_data/demo_stock.csv", 13, True, False, 2, 1, None, None, True, "Prices"]
input_schema_2 = ["./examples/demo_data/demo_stock.csv", 13, True, True, None, 2, 3, None, False, "Changes"]
input_schema_3 = []
input_schema_4 = []
input_schema_5 = []
input_schema_6 = []
input_schema_7 = []
input_schema_8 = []
input_schema_9 = []
input_schema_10 = []
