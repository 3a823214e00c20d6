{ visible: 1, hidden:: 2 }
