#!/usr/bin/env python3
"""Generate a Kaggle-amazon-books-review-shaped corpus at the reference's
scale (books_data.csv 212k rows, Books_rating.csv 3M rows) for the
pipeline throughput benchmark (graft.PipelineBench). Dev tool only."""
import random
import sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/books_bench"
n_books = int(sys.argv[2]) if len(sys.argv) > 2 else 212_404
n_reviews = int(sys.argv[3]) if len(sys.argv) > 3 else 3_000_000
rnd = random.Random(42)

import os
os.makedirs(out, exist_ok=True)
words = [f"w{i}" for i in range(5000)]

with open(f"{out}/books_data.csv", "w") as f:
    f.write("title,description,authors,image,previewLink,publisher,publishedDate,infoLink,categories,ratingsCount\n")
    for i in range(n_books):
        authors = "', '".join(f"Author {rnd.randrange(50000)}" for _ in range(1 + (i % 3 == 0)))
        cats = "', '".join(f"Cat{rnd.randrange(30)}" for _ in range(1 + (i % 5 == 0)))
        img = "garbage" if rnd.random() < 0.03 else f"http://img/{i}"
        date = (str(1950 + rnd.randrange(70)) if rnd.random() < 0.25
                else f"{1950 + rnd.randrange(70)}-{1 + rnd.randrange(9):02d}-{1 + rnd.randrange(27):02d}")
        rc = "bad" if rnd.random() < 0.05 else str(rnd.randrange(9000))
        desc = " ".join(rnd.choice(words) for _ in range(12))
        f.write(f"Book {i},{desc},\"['{authors}']\",{img},http://prev/{i},Pub{i % 2000},{date},http://info/{i},\"['{cats}']\",{rc}\n")

with open(f"{out}/Books_rating.csv", "w") as f:
    f.write("Id,Title,Price,User_id,profileName,review/helpfulness,review/score,review/time,review/summary,review/text\n")
    for i in range(n_reviews):
        b = rnd.randrange(n_books)
        help_ = rnd.choice(["0/0", "", f"{rnd.randrange(30)}/{1 + rnd.randrange(30)}",
                            f"{rnd.randrange(30)}/{1 + rnd.randrange(30)}"])
        score = "garbage" if rnd.random() < 0.08 else str(1 + rnd.randrange(5))
        t = 1_000_000_000 + rnd.randrange(600_000_000)
        text = " ".join(rnd.choice(words) for _ in range(20))
        f.write(f"{i},Book {b},,u{rnd.randrange(400000)},Name {i},{help_},{score},{t},summary {i},{text}\n")
print(f"wrote {out}: {n_books} books, {n_reviews} reviews")
